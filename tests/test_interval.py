"""Interval query (the reference's one real query, main.py:61-86):
closed bounds, ascending order, projection, count, range guard."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from parcial_bigdata_spark.operators import interval as iv


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        (dt.datetime(2025, 1, 1, 10, 0, 0), Decimal("3920.0000")),
        (dt.datetime(2025, 1, 1, 12, 0, 0), Decimal("3921.5000")),
        (dt.datetime(2025, 1, 1, 11, 0, 0), Decimal("3922.2500")),
        (dt.datetime(2025, 1, 2, 9, 0, 0), Decimal("3930.0000")),
    ]
    return spark.createDataFrame(rows, "fechahora timestamp, valor decimal(12,4)")


def test_interval_closed_bounds_and_order(series):
    out = iv.interval(
        series,
        "fechahora",
        "valor",
        dt.datetime(2025, 1, 1, 10, 0, 0),
        dt.datetime(2025, 1, 1, 12, 0, 0),
    ).collect()
    # both endpoints included (>= and <=), ascending, valor → double
    assert [(r.fechahora, r.valor) for r in out] == [
        (dt.datetime(2025, 1, 1, 10, 0, 0), 3920.0),
        (dt.datetime(2025, 1, 1, 11, 0, 0), 3922.25),
        (dt.datetime(2025, 1, 1, 12, 0, 0), 3921.5),
    ]
    assert all(isinstance(r.valor, float) for r in out)


def test_interval_count(series):
    out = iv.interval_count(
        series, "fechahora", dt.datetime(2025, 1, 1, 0, 0, 0), dt.datetime(2025, 1, 1, 23, 59, 59)
    ).collect()
    assert out[0].cnt == 3


def test_validate_range_rejects_inverted():
    with pytest.raises(ValueError):
        iv.validate_range(dt.datetime(2025, 1, 2), dt.datetime(2025, 1, 1))
    with pytest.raises(ValueError):
        iv.validate_range(dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 1))
    iv.validate_range(dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 2))  # ok


def test_events_interval_pushes_nanos_predicate(spark):
    """The events ts range filter must reach the parquet scan whichever way
    the fixture stores ts: TIMESTAMP(NANOS) (read as bigint; interval()
    translates bounds to nanos and pushes on the raw column) or
    TIMESTAMP(MICROS) (native TIMESTAMP scan column; the timestamp
    predicate pushes directly) — row-group pruning at 100 TB either way."""
    import os

    import pytest as _pytest

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        _pytest.skip("driver testdata not present")
    import pyarrow.parquet as pq

    from parcial_bigdata_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    plan = (
        iv.interval(events, "ts", "value", "2024-01-05 00:00:00", "2024-01-20 00:00:00")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    arrow_ts = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    if str(arrow_ts) == "timestamp[ns]":
        # nanos escape: bounds translated to raw int64 nanos, pushed on ts
        assert "GreaterThanOrEqual(ts,1704412800000000000)" in plan
        assert "LessThanOrEqual(ts,1705708800000000999)" in plan
        assert read_schema == "struct<ts:bigint,value:double>"
    else:
        # native timestamp column: the range predicate pushes as-is
        assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan
        assert "LessThanOrEqual(ts," in plan
        assert read_schema == "struct<ts:timestamp,value:double>"


def test_interval_pushes_predicate_to_parquet(spark, series, tmp_path):
    """The range filter must reach the scan (PushedFilters), and the scan
    must read only the two projected columns (ReadSchema) — SURVEY.md §4."""
    path = str(tmp_path / "series")
    series.withColumn("extra", series.valor * 2).write.parquet(path)
    df = spark.read.parquet(path)
    plan = iv.interval(
        df, "fechahora", "valor", dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 2)
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(fechahora), GreaterThanOrEqual(fechahora" in plan
    assert "extra" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_interval_nanos_path_agrees_on_negative_nanos(spark):
    """Pre-epoch timestamps: the pushed-down nanos-bound filter must
    select exactly the rows the derived-timestamp predicate would —
    catalog derives ts with FLOOR division, and the bound algebra
    assumes floor (round-5 review: `div` truncation disagreed on
    negative nanos)."""
    from pyspark.sql import functions as F

    nanos = [-2001, -2000, -1500, -1000, -999, -1, 0, 1, 999, 1000, 1500]
    df = spark.createDataFrame([(n,) for n in nanos], "ts_nanos long").withColumn(
        "ts",
        F.timestamp_micros(
            F.expr(
                "ts_nanos div 1000 - (CASE WHEN ts_nanos % 1000 < 0 THEN 1 ELSE 0 END)"
            )
        ),
    ).withColumn("value", F.col("ts_nanos").cast("double"))
    start, end = "1969-12-31 23:59:59.999999", "1970-01-01 00:00:00.000001"
    # nanos fast path (ts_nanos present) vs the plain ts predicate
    fast = {r.value for r in iv.interval(df, "ts", "value", start, end).collect()}
    slow = {
        r.value
        for r in iv.interval(
            df.drop("ts_nanos"), "ts", "value", start, end
        ).collect()
    }
    assert fast == slow and fast  # identical, and non-empty
