"""Reference-pipeline semantics (SURVEY.md §2) re-expressed over the
driver test tables, each with a DuckDB oracle. Filled in Phase 2."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
