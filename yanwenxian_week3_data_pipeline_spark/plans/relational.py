"""EXT relational surface (SURVEY.md §2.10): joins, grouped aggregation,
rollup/cube, window functions, set ops, sorts/top-k, event-time windows over
the star schema. Populated incrementally."""

from __future__ import annotations

from . import QuerySpec

QUERIES: list[QuerySpec] = []
