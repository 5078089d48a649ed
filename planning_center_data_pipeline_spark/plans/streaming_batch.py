"""Batch-mode formulations of the streaming-wing queries (SURVEY.md
§2.9) so the DuckDB oracle can check them. Filled in Phase 4."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
