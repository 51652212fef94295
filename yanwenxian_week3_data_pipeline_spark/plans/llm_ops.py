"""EXT LLM-data-pipeline surface: dedup family, similarity search, text
analysis, multimodal plumbing. Populated incrementally."""

from __future__ import annotations

from . import QuerySpec

QUERIES: list[QuerySpec] = []
