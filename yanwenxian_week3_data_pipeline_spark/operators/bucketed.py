"""Bucketed (pre-shuffled) table layout — the co-located join strategy.

A join between two tables bucketed by the join key into the same number of
buckets needs NO exchange: each task reads bucket i of both sides and
sort-merge-joins them locally. At 100 TB this turns the nightly
fact-to-fact join from a full-network shuffle of both tables into a
file-local merge — the single biggest shuffle eliminator Spark offers for
repeated joins on a stable key. ``sortBy`` within buckets additionally
drops the per-task sort from the merge join.

The write itself pays one shuffle (clustering rows into buckets); that cost
is amortized over every subsequent join/aggregation on the bucket key —
groupBy on the bucket key is likewise exchange-free.

EXT surface (SURVEY.md §2.10 — the reference has no joins at all); the
plan-shape guarantee is asserted in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 8,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by
    ``bucket_cols``. ``path`` makes it an external table (tests point this
    at a tmp dir; production at the warehouse root)."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With both sides
    bucketed into the same bucket count, Catalyst plans a sort-merge join
    with zero Exchange nodes (bucket-local merge)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
