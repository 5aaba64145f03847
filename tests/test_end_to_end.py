"""End-to-end lifecycle (the reference's three stages composed): fetch →
bronze landing → streaming silver load → interval query; plus the
streaming/batch twin equivalence on the windowed aggregates."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from parcial_bigdata_spark.operators import interval as iv
from parcial_bigdata_spark.operators import windows as bw
from parcial_bigdata_spark.sources import http as http_src
from parcial_bigdata_spark.streaming import pipeline as sp
from parcial_bigdata_spark.streaming import windows as sw


def test_full_pipeline_fetch_to_interval_query(spark, tmp_path):
    """Stage A (fetch) → stage B (incremental load) → stage C (query),
    exactly the reference's lambda/app.py → subirDB.py → main.py flow."""
    bronze, silver, ckpt = tmp_path / "bronze", tmp_path / "silver", tmp_path / "ckpt"

    # Stage A: two daily fetches land verbatim payloads (epoch-keyed)
    day1 = [["1757509256000", "3920.00"], ["1757512856000", "3921.50"]]
    day2 = [["1757595656000", "3930.00"], ["bad-row", "x"]]
    for epoch, payload in [(1757509256, day1), (1757595656, day2)]:
        http_src.fetch_to_landing(
            "http://banrep.test/dolar", str(bronze),
            fetcher=lambda url, p=payload: json.dumps(p).encode(), epoch=epoch,
        )

    # Stage B: streaming incremental load with accounting
    metrics = []
    sp.start_silver_stream(
        spark, str(bronze), str(silver), str(ckpt),
        on_metrics=lambda bid, m: metrics.append(m),
    ).awaitTermination()
    assert metrics[-1]["rows_inserted"] == 3
    assert metrics[-1]["bad_rows"] == 1

    # Stage C: interval query over the silver table
    silver_df = spark.read.parquet(str(silver))
    out = iv.interval(
        silver_df, "fechahora", "valor",
        dt.datetime(2025, 9, 10, 0, 0, 0), dt.datetime(2025, 9, 10, 23, 59, 59),
    ).collect()
    assert [(r.fechahora, r.valor) for r in out] == [
        (dt.datetime(2025, 9, 10, 13, 0, 56), 3920.0),
        (dt.datetime(2025, 9, 10, 14, 0, 56), 3921.5),
    ]
    cnt = iv.interval_count(
        silver_df, "fechahora",
        dt.datetime(2025, 9, 10, 0, 0, 0), dt.datetime(2025, 9, 11, 23, 59, 59),
    ).collect()[0].cnt
    assert cnt == 3


EVENTS_SCHEMA = "event_id long, user_id long, ts timestamp, event_type string, value double"


def test_streaming_hourly_rollup_equals_batch(spark, tmp_path):
    """The streaming windowed agg must produce exactly the batch
    hourly_rollup rows on the same data (same output schema contract)."""
    d = tmp_path / "events"
    d.mkdir()
    base = dt.datetime(2025, 1, 1, 10, 0, 0)
    rows = [
        {"event_id": i, "user_id": i % 3, "ts": (base + dt.timedelta(minutes=7 * i)).strftime("%Y-%m-%dT%H:%M:%S"),
         "event_type": ["click", "view"][i % 2], "value": float(i)}
        for i in range(40)
    ]
    with open(d / "e.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    batch_df = spark.read.schema(EVENTS_SCHEMA).json(str(d))
    expected = sorted(
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in bw.hourly_rollup(batch_df).collect()
    )

    stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(d))
    q = (
        sw.streaming_hourly_rollup(stream)
        .writeStream.format("memory").queryName("sb_hourly").outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in spark.sql("select * from sb_hourly").collect()
    )
    assert got == expected
