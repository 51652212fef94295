"""Structured Streaming twins vs their batch counterparts: drain the events
table (as a JSONL stream) with availableNow and diff against the batch
operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_src(spark, sf_dir, tmp_path_factory):
    """Dump events to a JSONL dir (the shape a streaming feed has) with ts
    as epoch-micros-derived timestamps serialized by Spark's JSON writer."""
    from yanwenxian_week3_data_pipeline_spark.sources.tables import load_events

    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_events(spark, sf_dir).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    )
    from yanwenxian_week3_data_pipeline_spark.streaming.jobs import JSON_TS_FORMAT

    ev.coalesce(2).write.mode("overwrite").option("timestampFormat", JSON_TS_FORMAT).json(d)
    return d


def test_tumbling_stream_matches_batch(spark, sf_dir, stream_src):
    from yanwenxian_week3_data_pipeline_spark.operators.sessionize import tumbling_window_agg
    from yanwenxian_week3_data_pipeline_spark.sources.tables import load_events
    from yanwenxian_week3_data_pipeline_spark.streaming.jobs import (
        run_available_now,
        tumbling_stream,
    )

    got = run_available_now(tumbling_stream(spark, stream_src), "tumbling_test", "complete")
    rows = {
        r.window_start.replace(tzinfo=None): (r.n_events, round(r.sum_value, 6))
        for r in got.collect()
    }

    batch = tumbling_window_agg(load_events(spark, sf_dir), "1 hour")
    expected = {
        r.window_start: (r.n_events, round(float(r.sum_value), 6))
        for r in batch.collect()
    }
    assert rows == expected


def test_session_window_stream_runs(spark, stream_src):
    from yanwenxian_week3_data_pipeline_spark.streaming.jobs import (
        run_available_now,
        session_window_stream,
    )

    got = run_available_now(session_window_stream(spark, stream_src), "sessionwin_test")
    assert got.count() > 0
    assert {"user_id", "session_start", "n_events"} <= set(got.columns)


def test_stateful_sessionize_matches_batch(spark, sf_dir, stream_src):
    """availableNow processes everything in one batch, so the CLOSED sessions
    emitted by the stateful operator must equal the batch sessionization
    minus each user's final (still-open) session."""
    from yanwenxian_week3_data_pipeline_spark.operators.sessionize import sessionize
    from yanwenxian_week3_data_pipeline_spark.sources.tables import load_events
    from yanwenxian_week3_data_pipeline_spark.streaming.jobs import (
        run_available_now,
        sessionize_stateful,
    )

    got = run_available_now(sessionize_stateful(spark, stream_src), "stateful_sessions")
    closed = {
        (r.user_id, r.session_start.replace(tzinfo=None), r.n_events)
        for r in got.collect()
        if r.closed
    }

    batch = sessionize(load_events(spark, sf_dir), gap_minutes=30)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    batch_no_last = (
        batch.withColumn("_max_seq", F.max("session_seq").over(w))
        .where(F.col("session_seq") < F.col("_max_seq"))
    )
    expected = {
        (r.user_id, r.session_start, r.n_events) for r in batch_no_last.collect()
    }
    assert closed == expected
    assert len(closed) > 0


def test_dedup_stream_drops_redelivered_events(spark, sf_dir, tmp_path):
    """Feed every event twice (at-least-once redelivery); the streaming
    dedup must emit each event_id exactly once."""
    from yanwenxian_week3_data_pipeline_spark.sources.tables import load_events
    from yanwenxian_week3_data_pipeline_spark.streaming.jobs import (
        JSON_TS_FORMAT,
        dedup_stream,
        run_available_now,
    )

    d = str(tmp_path / "dup_events")
    ev = load_events(spark, sf_dir).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    )
    ev.unionAll(ev).coalesce(2).write.mode("overwrite").option(
        "timestampFormat", JSON_TS_FORMAT
    ).json(d)

    got = run_available_now(dedup_stream(spark, d), "dedup_stream_test")
    n_distinct = ev.select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct
