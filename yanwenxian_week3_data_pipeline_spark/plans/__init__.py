"""Named query plans. Each ``QuerySpec`` pairs a DataFrame-API builder with
its DuckDB oracle SQL (None for genuinely non-SQL-expressible ops → the
driver records a rows-only check).

``all_queries()`` is the single registry consumed by __spark_entry__.py,
bench.py and the parity tests.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py
    doc: str = ""


def all_queries() -> dict[str, QuerySpec]:
    from . import analytic_ext, llm_ops, reference_surface, relational, tpch_depth, tpch_shapes

    specs: dict[str, QuerySpec] = {}
    for mod in (reference_surface, relational, tpch_shapes, tpch_depth, analytic_ext, llm_ops):
        for spec in mod.QUERIES:
            if spec.name in specs:
                raise ValueError(f"duplicate query name {spec.name}")
            specs[spec.name] = spec
    return specs
