"""applyInPandasWithState: running per-user totals across micro-batches."""

from __future__ import annotations

import datetime as dt
import json

from parcial_bigdata_spark.streaming import stateful

EVENTS_SCHEMA = "event_id long, user_id long, ts timestamp, event_type string, value double"


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_user_totals_accumulate(spark, tmp_path):
    d = tmp_path / "events"
    d.mkdir()
    iso = lambda m: (dt.datetime(2025, 1, 1, 10, 0) + dt.timedelta(minutes=m)).strftime(
        "%Y-%m-%dT%H:%M:%S"
    )
    _write(d / "p1.json", [
        {"event_id": 1, "user_id": 1, "ts": iso(0), "event_type": "c", "value": 10.0},
        {"event_id": 2, "user_id": 1, "ts": iso(5), "event_type": "c", "value": 30.0},
        {"event_id": 3, "user_id": 2, "ts": iso(0), "event_type": "c", "value": 7.0},
    ])
    _write(d / "p2.json", [
        {"event_id": 4, "user_id": 1, "ts": iso(10), "event_type": "c", "value": 2.0},
    ])

    # maxFilesPerTrigger=1 → one micro-batch per file, state carries over
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    out = stateful.streaming_user_totals(stream)
    per_batch: dict[int, dict] = {}

    def capture(batch_df, batch_id):
        per_batch[batch_id] = {r.user_id: r for r in batch_df.collect()}

    q = (
        out.writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(per_batch) == 2
    b0, b1 = per_batch[0], per_batch[1]
    assert b0[1].n_events == 2 and b0[1].total_value == 40.0 and b0[1].max_value == 30.0
    assert b0[2].n_events == 1 and b0[2].total_value == 7.0
    # batch 1: user 1's state accumulated across batches
    assert b1[1].n_events == 3 and b1[1].total_value == 42.0 and b1[1].max_value == 30.0
    # update mode: untouched user 2 emits nothing in batch 1
    assert 2 not in b1


def test_running_zscore_prefix_rule_golden(spark, tmp_path):
    """Hand-checked prefix decisions through the REAL streaming path:
    events score only against strictly-earlier history (n >= 3), and a
    zero-variance history flags any deviating value."""
    import datetime as dt

    from parcial_bigdata_spark.streaming.stateful import (
        running_zscore_available_now,
    )

    rows = [
        # user 1: three identical values then a spike — zero-variance
        # history, the spike must flag
        (1, dt.datetime(2024, 1, 1, 0), 1, "a", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1), 1, "a", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 2), 1, "a", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 3), 1, "a", 100.0, "{}"),
        # user 2: mild continuation — scored but not flagged
        (5, dt.datetime(2024, 1, 1, 0), 2, "a", 1.0, "{}"),
        (6, dt.datetime(2024, 1, 1, 1), 2, "a", 2.0, "{}"),
        (7, dt.datetime(2024, 1, 1, 2), 2, "a", 3.0, "{}"),
        (8, dt.datetime(2024, 1, 1, 3), 2, "a", 2.5, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)
    out = {
        r.event_id: (r.n_prior, r.scored, r.is_outlier)
        for r in running_zscore_available_now(spark, path).collect()
    }
    assert len(out) == 8
    # first three events of each user have insufficient history
    for eid in (1, 2, 3, 5, 6, 7):
        assert out[eid][1] == 0 and out[eid][2] == 0
    assert out[4] == (3, 1, 1)   # spike against zero-variance history
    assert out[8] == (3, 1, 0)   # 2.5 after [1,2,3]: inside 3 sigma


def test_running_zscore_survives_multi_chunk_groups(spark, tmp_path):
    """Regression (round-10 review): per-chunk sorting broke the
    strictly-earlier prefix for users wider than one Arrow chunk; the
    transition now concatenates the group's chunks and sorts once.
    Forcing 10-row chunks over a 60-event user must still match the
    batch prefix rule exactly."""
    import datetime as dt

    from parcial_bigdata_spark.streaming.stateful import (
        running_zscore_available_now,
    )

    # one user, 60 events: constant value except a spike at the end
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "a",
         5.0 if i < 59 else 500.0, "{}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        out = {
            r.event_id: (r.n_prior, r.is_outlier)
            for r in running_zscore_available_now(spark, path).collect()
        }
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert len(out) == 60
    # prefix order intact: n_prior is exactly the event index
    assert all(out[i][0] == i for i in range(60))
    # zero-variance history flags only the final spike
    assert [i for i in range(60) if out[i][1] == 1] == [59]
