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


def _local_parquet_bytes(path: str) -> int | None:
    """Driver-side total byte size of a local parquet file or directory of
    part files; None when the path is not a local filesystem path (object
    stores return None → the fan-out below self-disables, since at real
    cluster scale scans have many splits anyway)."""
    p = path[len("file:") :] if path.startswith("file:") else path
    if not os.path.exists(p):
        return None
    if os.path.isfile(p):
        return os.path.getsize(p)
    total = 0
    for root, _dirs, files in os.walk(p):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def read_parquet_fanout(
    spark: SparkSession, path: str, min_bytes: int
) -> DataFrame:
    """``spark.read.parquet`` plus a SIZE-GATED scan fan-out for
    under-split inputs.

    Parquet parallelism is bounded by row groups: a single small-file
    table (the driver testdata layout — one file, one row group) is ONE
    input split no matter how many cores exist, so every map-side
    operator over it (tokenize + 32 md5s per shingle for MinHash, the
    decimal partial aggregates of Q1) runs on one core. Measured at the
    sf1-equivalent set: q1 5.9 s → 2.9 s, dedup_minhash_lsh 14.1 s →
    7.4 s from one explicit round-robin repartition after the scan.

    The gate keeps the repartition out of every case where it cannot pay:
      - total bytes < ``min_bytes``  → the map work is too small to beat
        the shuffle + task overhead (the round-4 sf0.1 measurement that
        rejected an unconditional loader fan-out);
      - estimated splits (total / spark.sql.files.maxPartitionBytes)
        already ≥ defaultParallelism → the scan parallelizes by itself —
        this is the 100 TB case, where the helper is a no-op by
        construction;
      - non-local path → size unknown, assume real-scale storage.

    Values are partitioning-independent for every registered query
    (proven by the local[4]/local[8] full sweeps), so this is a pure
    plan-level change.
    """
    df = spark.read.parquet(path)
    total = _local_parquet_bytes(path)
    if total is None or total < min_bytes:
        return df
    try:
        mpb_raw = spark.conf.get("spark.sql.files.maxPartitionBytes")
        digits = "".join(c for c in str(mpb_raw) if c.isdigit())
        mpb = int(digits) if digits else 128 * 1024 * 1024
    except Exception:  # noqa: BLE001 - conf lookup must never break a scan
        mpb = 128 * 1024 * 1024
    par = spark.sparkContext.defaultParallelism
    est_splits = max(1, -(-total // mpb))
    if est_splits >= par:
        return df
    return df.repartition(par)


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
