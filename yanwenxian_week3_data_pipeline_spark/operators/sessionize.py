"""Event-time windowing operators over the ``events`` table (EXT surface,
SURVEY.md §2.10): tumbling windows and gap-based sessionization in batch
form. Structured Streaming twins live in ``streaming/jobs.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def tumbling_window_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Per-window event counts + value sum via the native ``F.window``
    operator (maps directly onto Structured Streaming's windowed agg)."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame, duration: str = "15 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Overlapping sliding windows via the native ``F.window`` operator —
    each event lands in duration/slide windows; Spark expands them with a
    single Expand + hash aggregate (no self-join)."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds the gap. Classic lag + running-sum windows —
    shuffles ONCE on user_id; both windows share that partitioning, so
    Catalyst plans a single exchange."""
    w_user = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    with_breaks = events.withColumn(
        "_new_session",
        F.when(F.col("ts") - F.lag("ts").over(w_user) > gap, 1).otherwise(0),
    )
    with_ids = with_breaks.withColumn(
        "session_seq", F.sum("_new_session").over(w_user).cast("long")
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(18,3)")).alias("sum_value"),
        )
    )
