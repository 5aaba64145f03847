"""Catalog guards: every driver table loads with its contract schema
(TESTDATA.md / FIXTURES.md), so fixture drift fails loudly here instead
of deep inside an operator."""

from __future__ import annotations

import os

import pytest

from parcial_bigdata_spark import catalog
from parcial_bigdata_spark.catalog import TABLES, load_table

SF_DIR = "/root/testdata/sf0.001"

EXPECTED_COLS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name", "p_brand"},
    "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                 "l_linestatus", "l_shipdate"},
    "events": {"event_id", "user_id", "ts", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.mark.parametrize("name", TABLES)
def test_table_loads_with_contract_columns(spark, name):
    df = load_table(spark, SF_DIR, name)
    assert EXPECTED_COLS[name] <= set(df.columns), (
        f"{name}: missing {EXPECTED_COLS[name] - set(df.columns)}"
    )
    assert df.count() > 0


def test_events_ts_is_timestamp_after_nanos_escape(spark):
    df = load_table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_unknown_table_rejected(spark):
    with pytest.raises(KeyError):
        load_table(spark, SF_DIR, "nope")


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_ts_layout_drift(spark, tmp_path, unit):
    """The driver has shipped events.ts both as TIMESTAMP(NANOS) and as
    TIMESTAMP(MICROS) without isAdjustedToUTC (regenerated between
    rounds).  load_table must yield a plain TIMESTAMP ts either way:
    nanos via the nanosAsLong escape + micros floor-division, micros via
    NTZ-inference off (NTZ would break unix_micros downstream)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / f"layout_{unit}"
    d.mkdir()
    stamps = [dt.datetime(2024, 1, 5, 12, 0, 0), dt.datetime(2024, 1, 10, 8, 30, 0)]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(stamps, pa.timestamp(unit)),
            "user_id": pa.array([7, 8], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == stamps
    if unit == "ns":
        assert "ts_nanos" in df.columns  # raw column kept for pushdown


def test_create_silver_table_escapes_location(spark, tmp_path):
    """A location containing a single quote must not break (or inject
    into) the DDL (round-5 review)."""
    loc = str(tmp_path / "user's files" / "dolar")
    spark.sql("DROP TABLE IF EXISTS quoted_silver")
    catalog.create_silver_table(spark, table="quoted_silver", location=loc)
    assert spark.catalog.tableExists("quoted_silver")
    spark.sql("DROP TABLE IF EXISTS quoted_silver")
