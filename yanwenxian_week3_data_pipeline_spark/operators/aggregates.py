"""Report aggregates (reference §2.6): funnel counts, per-column
completeness, pass rate, failure distribution, top failure, date range.

The reference computes these as whole-frame pandas reductions
(cleaner.py:182-243, validator.py:120-127). Here each is a single
``agg``/``groupBy`` over the (cached) stage DataFrames; results are tiny
aggregate rows safe to collect for report rendering at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import is_missing_expr


def completeness(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column non-empty counts: (column, non_empty, total, pct).
    One pass: conditional sums, no per-column jobs. (cleaner.py:193-202)"""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs.append(
            F.sum(F.when(~is_missing_expr(F.col(c).cast("string")), 1).otherwise(0)).alias(f"_ne_{c}")
        )
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"_ne_{c}").cast("long").alias("non_empty"),
                        F.col("_total").cast("long").alias("total"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return stacked.withColumn(
        "pct",
        F.round(F.when(F.col("total") > 0, F.col("non_empty") * 100.0 / F.col("total")).otherwise(0.0), 1),
    )


def failure_distribution(validated: DataFrame) -> DataFrame:
    """Reason-code frequency, sorted desc (validator.py:126 most_common)."""
    return (
        validated.where(~F.col("passed"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("reason"))
    )


def pass_rate(validated: DataFrame) -> DataFrame:
    """(total, passed, failed, pass_rate_pct) in one aggregation."""
    return validated.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("passed"), 1).otherwise(0)).cast("long").alias("passed"),
        F.sum(F.when(~F.col("passed"), 1).otherwise(0)).cast("long").alias("failed"),
    ).withColumn(
        "pass_rate_pct",
        F.round(F.when(F.col("total") > 0, F.col("passed") * 100.0 / F.col("total")).otherwise(0.0), 1),
    )


def date_range(df: DataFrame, ts_col: str) -> DataFrame:
    """(earliest, latest, n_dated, n_rows) — min/max/count ignore nulls
    natively (cleaner.py:227-243)."""
    return df.agg(
        F.min(ts_col).alias("earliest"),
        F.max(ts_col).alias("latest"),
        F.count(ts_col).cast("long").alias("n_dated"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def funnel(spark: SparkSession, stage_counts: dict[str, int]) -> DataFrame:
    """Materialize the stage-count funnel as a tiny DataFrame
    (stage_idx, stage, rows) for reporting/oracle comparison."""
    rows = [(i, name, int(n)) for i, (name, n) in enumerate(stage_counts.items())]
    return spark.createDataFrame(rows, "stage_idx int, stage string, rows long")
