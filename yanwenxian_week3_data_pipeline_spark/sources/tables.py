"""Parquet table loaders for the driver-materialized star schema
(see /root/repo/TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings.

Plain ``spark.read.parquet`` — Catalyst handles column pruning and filter
pushdown; do NOT pre-collect or pre-filter here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP_NTZ regardless of how the parquet
    stores it: TIMESTAMP(NANOS) (rejected by Spark's reader unless read as
    long via the legacy conf, then converted truncating to micros — matches
    DuckDB's read of the same file) or a plain micros timestamp. Session
    timezone is pinned to UTC for any LTZ→NTZ hop so the result is
    timezone-independent."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) surfaced as long
        ts = F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
    else:
        ts = F.col("ts").cast("timestamp_ntz")
    return raw.withColumn("ts", ts)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators are usable from
    Spark SQL as well as the DataFrame API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
