"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship documents quality-funnel at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the EXT surface) with DuckDB oracle twins.

All real logic lives in ``yanwenxian_week3_data_pipeline_spark``; this file
only adapts the plan registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from yanwenxian_week3_data_pipeline_spark.plans import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the documents quality funnel (clean → drop-incomplete →
    keep-first dedup → validate) at sf0.001."""
    specs = all_queries()
    return specs["agg_counts_funnel"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
