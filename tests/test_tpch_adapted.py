"""Golden tests for the round-3 TPC-H adaptations: Q2 (min-cost supplier
over a lineitem-derived cost table), Q12 (priority line counts by
linestatus), Q20 (dominant part-family suppliers).  Each adaptation's
deviation from literal TPC-H is documented on the operator."""

from __future__ import annotations

import datetime as dt

from parcial_bigdata_spark.operators import joins

NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
SUPP_SCHEMA = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string, "
    "p_size int, p_retailprice double"
)


def _d(year: int, month: int = 6, day: int = 1) -> dt.datetime:
    return dt.datetime(year, month, day)


def test_min_cost_supplier_picks_regional_minimum(spark):
    part = spark.createDataFrame(
        [
            (1, "blue bolt", "B1", "PROMO", 5, 10.0),
            (2, "red ring", "B2", "PROMO", 5, 10.0),
            (3, "odd size", "B3", "PROMO", 9, 10.0),  # size filter drops it
        ],
        PART_SCHEMA,
    )
    nation = spark.createDataFrame([(1, "N_EU", 10), (2, "N_AS", 20)], NATION_SCHEMA)
    region = spark.createDataFrame([(10, "EUROPE"), (20, "ASIA")], "r_regionkey int, r_name string")
    supplier = spark.createDataFrame(
        [(1, "s1", 1, 100.0), (2, "s2", 1, 200.0), (3, "s3", 2, 999.0)], SUPP_SCHEMA
    )
    lineitem = spark.createDataFrame(
        [
            # part 1: s1 sells at 5.0/unit, s2 at 4.0/unit -> s2 wins
            (1, 1, 50.0, 10.0),
            (1, 2, 40.0, 10.0),
            # part 1 via s3 at 1.0/unit — but s3 is outside EUROPE
            (1, 3, 10.0, 10.0),
            # part 2: only s1 offers it
            (2, 1, 30.0, 10.0),
            # part 3 would be cheapest but its size is filtered out
            (3, 1, 1.0, 10.0),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_quantity double",
    )
    rows = joins.min_cost_supplier(part, supplier, nation, region, lineitem).collect()
    got = [(r.s_name, r.p_partkey, r.unit_cost) for r in rows]
    # ordered by s_acctbal desc: s2 (200.0) before s1 (100.0)
    assert got == [("s2", 1, 4.0), ("s1", 2, 3.0)]


def test_min_cost_supplier_keeps_ties(spark):
    part = spark.createDataFrame([(1, "p", "B", "PROMO", 5, 1.0)], PART_SCHEMA)
    nation = spark.createDataFrame([(1, "N_EU", 10)], NATION_SCHEMA)
    region = spark.createDataFrame([(10, "EUROPE")], "r_regionkey int, r_name string")
    supplier = spark.createDataFrame([(1, "s1", 1, 1.0), (2, "s2", 1, 2.0)], SUPP_SCHEMA)
    lineitem = spark.createDataFrame(
        [(1, 1, 20.0, 10.0), (1, 2, 10.0, 5.0)],  # both 2.0/unit
        "l_partkey long, l_suppkey long, l_extendedprice double, l_quantity double",
    )
    rows = joins.min_cost_supplier(part, supplier, nation, region, lineitem).collect()
    assert {(r.s_name, r.unit_cost) for r in rows} == {("s1", 2.0), ("s2", 2.0)}


def test_line_priority_by_status_counts(spark):
    orders = spark.createDataFrame(
        [(1, "1-URGENT"), (2, "5-LOW"), (3, "2-HIGH")],
        "o_orderkey long, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, "O", _d(1996)),   # high
            (1, "F", _d(1996)),   # high
            (2, "O", _d(1996)),   # low
            (3, "O", _d(1997)),   # outside window -> dropped
        ],
        "l_orderkey long, l_linestatus string, l_shipdate timestamp",
    )
    rows = joins.line_priority_by_status(orders, lineitem).collect()
    got = {r.l_linestatus: (r.high_line_count, r.low_line_count) for r in rows}
    assert got == {"F": (1, 0), "O": (1, 1)}


def test_dominant_part_suppliers_threshold_and_nation(spark):
    part = spark.createDataFrame(
        [(1, "small ring", "B", "T", 1, 1.0), (2, "big bolt", "B", "T", 1, 1.0)],
        PART_SCHEMA,
    )
    nation = spark.createDataFrame([(1, "N_A", 0), (2, "N_B", 0)], NATION_SCHEMA)
    supplier = spark.createDataFrame(
        [(1, "s1", 1, 0.0), (2, "s2", 2, 0.0)], SUPP_SCHEMA
    )
    lineitem = spark.createDataFrame(
        [
            # part 1 ('small%'): s1 ships 80 of 100 -> dominant
            (1, 1, 80.0, _d(1996)),
            (1, 2, 20.0, _d(1996)),
            # part 2 not in the family: s2's 100% share must not count
            (2, 2, 50.0, _d(1996)),
            # out-of-window shipment must not flip s2 on part 1
            (1, 2, 500.0, _d(1997, 8)),
        ],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate timestamp",
    )
    rows = joins.dominant_part_suppliers(part, supplier, nation, lineitem).collect()
    assert [r.s_name for r in rows] == ["s1"]
    # nation filter keeps the semi-join shape honest
    none = joins.dominant_part_suppliers(
        part, supplier, nation, lineitem, nation_name="N_B"
    ).collect()
    assert none == []
    same = joins.dominant_part_suppliers(
        part, supplier, nation, lineitem, nation_name="N_A"
    ).collect()
    assert [r.s_name for r in same] == ["s1"]


def test_trimmed_price_means_exact(spark):
    """20 rows, one status, one extreme outlier each side: k=1 drops
    exactly the min and max for the trimmed mean; the winsorized mean
    clamps them to the rank-2 / rank-19 values."""
    from parcial_bigdata_spark.operators.aggregations import (
        trimmed_price_means,
    )

    vals = [1000.0 * i for i in range(1, 19)] + [0.01, 1e6]  # 20 rows
    orders = spark.createDataFrame(
        [(i, "O", v) for i, v in enumerate(vals)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    row = trimmed_price_means(orders).collect()[0]
    s = sorted(vals)
    inner = s[1:-1]
    assert (row.n_orders, row.n_trimmed_each_side) == (20, 1)
    assert row.trimmed_mean == round(sum(inner) / 18, 4)
    assert row.winsorized_mean == round((sum(inner) + s[1] + s[-2]) / 20, 4)
    assert (row.lo_clamp, row.hi_clamp) == (s[1], s[-2])
