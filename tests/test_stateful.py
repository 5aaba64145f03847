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
