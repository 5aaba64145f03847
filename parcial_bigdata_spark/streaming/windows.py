"""Stateful streaming aggregations over the events stream (ST7
extensions, SURVEY.md §2.9): watermarked tumbling / sliding / session
windows.  These are the streaming twins of operators/windows.py — same
output schemas, so batch and streaming results are comparable.

Watermarks bound the state store: with ``withWatermark(ts, delay)`` the
store only holds windows younger than the watermark, so state stays
O(active windows), not O(stream history) — the property that lets the
same query run forever on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window counts/sums per event_type; late rows within
    the watermark still update their window, older ones are dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_tumbling_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Generic tumbling counts — the op used to demonstrate watermark
    semantics: events older than (max seen ts − watermark) are dropped;
    in append mode a window only emits once the watermark passes its
    end (exactly-once finalized results downstream)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (each row lands in window/slide
    overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def streaming_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows with a dynamic gap — the streaming twin of
    operators/windows.sessionize (same aggregate columns; session identity
    is the window itself rather than a per-user sequence number).

    Gap-boundary semantics: session_window spans [ts, ts+gap) per event
    and MERGES touching windows, so an event exactly ``gap`` after its
    predecessor joins the same session — identical to the batch twin's
    strict ``diff > gap`` new-session rule and its SQL oracle (pinned by
    tests/test_streaming.py::test_session_window_exact_gap_boundary)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def _run_available_now(spark, events_parquet: str, transform, name: str) -> DataFrame:
    """Run ``transform(stream)`` as a REAL structured-streaming query
    (file-stream source over the events parquet, Trigger.AvailableNow,
    complete-mode memory sink) and return the final table — proof that
    a streaming twin converges to the batch answer on a bounded input,
    hash-checkable against the batch operator's SQL oracle.

    Complete mode emits every window at termination regardless of the
    watermark, so on a finite replay the result is exactly the batch
    group-by.  The memory sink is the test/driver harness sink; a
    production deployment writes the same query to Kafka/Delta with the
    same AvailableNow cadence (checkpointed, restart-safe)."""
    import os
    import tempfile

    schema = spark.read.parquet(events_parquet).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(events_parquet):
        # Spark-written parquet: a DIRECTORY of part files — stream it
        # directly (a basename glob on the parent would match no leaf
        # files and silently return an empty table).
        stream = reader.parquet(events_parquet)
    else:
        # single-file parquet (pyarrow-written fixtures):
        # FileStreamSource requires a directory, so stream the parent
        # with a glob pinned to the events file (same trick as the
        # bronze P1 filter)
        stream = reader.option(
            "pathGlobFilter", os.path.basename(events_parquet)
        ).parquet(os.path.dirname(events_parquet))
    with tempfile.TemporaryDirectory(prefix="stream-ckpt-") as ckpt:
        q = (
            transform(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def hourly_rollup_available_now(spark, events_parquet: str) -> DataFrame:
    """streaming_hourly_rollup under AvailableNow — shares the batch
    rollup's SQL oracle (see _run_available_now)."""
    return _run_available_now(
        spark, events_parquet, streaming_hourly_rollup, "stream_hourly_rollup_result"
    ).orderBy("window_start", "event_type")


def sessionize_available_now(
    spark, events_parquet: str, gap: str = "30 minutes"
) -> DataFrame:
    """streaming_sessionize under AvailableNow: session_window merges
    events within ``gap`` of the running session end — identical
    partitioning to the batch lag-gap sessionization, with
    session_end = last event + gap.  Oracle: the batch gap-CTE grouped
    per session with max(ts) + gap as the end."""
    return _run_available_now(
        spark,
        events_parquet,
        lambda st: streaming_sessionize(st, gap=gap),
        "stream_sessionize_result",
    ).orderBy("user_id", "session_start")
