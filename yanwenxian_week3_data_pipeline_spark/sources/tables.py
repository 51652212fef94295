"""Parquet table loaders for the driver-materialized star schema
(see /root/repo/TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings.

Plain ``spark.read.parquet`` — Catalyst handles column pruning and filter
pushdown; do NOT pre-collect or pre-filter here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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
    """Load events with ``ts`` as TIMESTAMP_NTZ, independent of session
    configuration. The driver parquet stores ``ts`` as TIMESTAMP(MICROS,
    isAdjustedToUTC=false); an explicit read schema forces NTZ even in a
    session where ``spark.sql.parquet.inferTimestampNTZ.enabled`` is off
    (which would otherwise surface it as LTZ in the session timezone). No
    session conf is mutated here — loaders must be side-effect free so
    concurrent queries sharing one session never race on reader behavior."""
    schema = (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    return spark.read.schema(schema).parquet(os.path.join(sf_dir, "events.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators are usable from
    Spark SQL as well as the DataFrame API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
