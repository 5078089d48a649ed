"""LLM-data-pipeline extension queries (SURVEY.md §2.10): dedup,
similarity search, text analysis. Filled in Phase 5."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
