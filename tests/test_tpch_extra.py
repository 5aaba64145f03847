"""Golden tests for the second TPC-H-style batch (Q4/Q10/Q14/Q18/Q19
shapes), exact percentiles, correlation stats, and the time-series
gap-fill operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from parcial_bigdata_spark.operators import aggregations, joins, windows


def _d(day: int) -> dt.datetime:
    return dt.datetime(1996, 1, day)


def test_order_priority_counts_exists_semantics(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 1.0, _d(5), "1-URGENT"),   # has late-shipped item → counted
            (2, 10, "O", 1.0, _d(5), "1-URGENT"),   # item shipped same day → NOT counted
            (3, 10, "O", 1.0, _d(5), "2-HIGH"),     # no items → NOT counted
            (4, 10, "O", 1.0, dt.datetime(1999, 1, 1), "1-URGENT"),  # outside window
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(1, _d(6)), (1, _d(2)), (2, _d(5)), (4, _d(9))],
        "l_orderkey long, l_shipdate timestamp",
    )
    got = {
        r.o_orderpriority: r.order_count
        for r in joins.order_priority_counts(orders, lineitem).collect()
    }
    assert got == {"1-URGENT": 1}


def test_promo_revenue_share_conditional_ratio(spark):
    lineitem = spark.createDataFrame(
        [(1, 100.0, 0.0, _d(10)), (2, 300.0, 0.0, _d(10))],
        "l_partkey long, l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    )
    [row] = joins.promo_revenue_share(lineitem, part).collect()
    assert row.promo_revenue_pct == 25.0


def test_large_orders_threshold_and_order(spark):
    customer = spark.createDataFrame(
        [(10, "Customer#10", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 500.0, _d(1), "1-URGENT"),
            (2, 10, "O", 900.0, _d(2), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(1, 200.0), (1, 60.0), (2, 100.0)],
        "l_orderkey long, l_quantity double",
    )
    rows = joins.large_orders(customer, orders, lineitem, min_total_qty=250.0).collect()
    assert [(r.o_orderkey, r.total_qty) for r in rows] == [(1, 260.0)]


def test_brand_band_revenue_disjunction(spark):
    lineitem = spark.createDataFrame(
        [(1, 5.0, 100.0, 0.0), (2, 15.0, 200.0, 0.0), (1, 30.0, 400.0, 0.0)],
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#12", 10), (2, "Brand#23", 18)],
        "p_partkey long, p_brand string, p_size int",
    )
    # row1 matches band 1; row2 matches band 2; row3 fails qty band
    [row] = joins.brand_band_revenue(lineitem, part).collect()
    assert (row.revenue, row.n_items) == (300.0, 2)


def test_percentile_exact_interpolation(spark):
    events = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), 1, "view", float(v), "{}") for i, v in enumerate([1, 2, 3, 4])],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    [row] = aggregations.percentile_value_by_type(events).collect()
    assert row.p50_value == 2.5  # linear interpolation, not nearest-rank
    assert row.p90_value == 3.7
    assert row.n_events == 4


def test_correlation_stats_perfect_linear(spark):
    lineitem = spark.createDataFrame(
        [("N", 1.0, 10.0), ("N", 2.0, 20.0), ("N", 3.0, 30.0)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    [row] = aggregations.correlation_stats(lineitem).collect()
    assert row.corr_qty_price == 1.0
    assert row.covar_qty_price == 10.0
    assert row.stddev_price == 10.0


def test_gapfill_carries_last_value_forward(spark):
    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 12), 1, "purchase", 150.0, "{}"),
            (2, dt.datetime(2024, 1, 3, 12), 1, "purchase", 170.0, "{}"),
            # user 2 defines the global span end; below min_value → filtered
            (3, dt.datetime(2024, 1, 4, 12), 2, "purchase", 10.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    rows = windows.gapfill_daily_series(events).collect()
    # only user 1 survives the filter; grid spans Jan 1-4 (global span)
    assert [(r.day.day, r.filled_value, r.observed) for r in rows] == [
        (1, 150.0, True),
        (2, 150.0, False),   # gap → carried forward
        (3, 170.0, True),
        (4, 170.0, False),   # trailing gap → carried forward
    ]


def test_returned_items_rounds_through_decimal(spark):
    """The money-round convention: a sum landing exactly on a .xx5
    boundary rounds HALF_UP deterministically (not via double repr)."""
    customer = spark.createDataFrame(
        [(10, "Customer#10", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(1, 10, "O", 1.0, _d(2), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(1, 10.005, 0.0, "R")],
        "l_orderkey long, l_extendedprice double, l_discount double, l_returnflag string",
    )
    [row] = joins.returned_item_revenue(customer, orders, lineitem).collect()
    assert row.revenue == 10.01


def test_top_revenue_suppliers_keeps_ties(spark):
    supplier = spark.createDataFrame(
        [(1, "S1", 0, 0.0), (2, "S2", 0, 0.0), (3, "S3", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 100.0, 0.0, _d(10)),
            (2, 60.0, 0.0, _d(11)),
            (2, 40.0, 0.0, _d(12)),   # supplier 2 also totals 100 → tie kept
            (3, 10.0, 0.0, _d(13)),
            (1, 999.0, 0.0, dt.datetime(1999, 6, 1)),  # outside the quarter
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    rows = joins.top_revenue_suppliers(supplier, lineitem).collect()
    assert [(r.s_suppkey, r.total_revenue) for r in rows] == [(1, 100.0), (2, 100.0)]


def test_top_revenue_suppliers_plan_shape(spark):
    """Round-4 rewrite contract: the scalar-max branch must NOT cost a
    single-partition WindowExec, and the per-supplier aggregate exchange
    must be reused (one lineitem scan feeding both branches)."""
    import os

    import pytest as _pytest

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        _pytest.skip("driver testdata not present")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    df = joins.top_revenue_suppliers(supplier, lineitem)
    df.collect()  # let AQE finalize the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "ReusedExchange" in plan or "reused" in plan.lower()


def test_wealthy_inactive_customers_avg_and_recency(spark):
    customer = spark.createDataFrame(
        [
            (1, "C1", 7, 100.0, "X"),   # above avg, recent order → excluded
            (2, "C2", 7, 90.0, "X"),    # above avg, only old order → kept
            (3, "C3", 8, 10.0, "X"),    # below avg → excluded
            (4, "C4", 8, -50.0, "X"),   # negative: excluded AND not in avg
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 1.0, dt.datetime(1999, 6, 1), "1-URGENT"),
            (2, 2, "O", 1.0, dt.datetime(1996, 6, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    # avg over positive balances = (100+90+10)/3 = 66.67
    rows = joins.wealthy_inactive_customers(customer, orders).collect()
    assert [(r.c_nationkey, r.n_customers, r.total_acctbal) for r in rows] == [(7, 1, 90.0)]


def test_order_price_rank_bands_golden(spark):
    orders = spark.createDataFrame(
        [(k, 1, "O", float(p), _d(1), "1-URGENT") for k, p in [(1, 40), (2, 30), (3, 20), (4, 10)]],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    rows = windows.order_price_rank_bands(orders).collect()
    assert [(r.o_orderkey, r.price_quartile, r.pct_rank, r.cume) for r in rows] == [
        (1, 1, 0.0, 0.25),
        (2, 2, round(1 / 3, 6), 0.5),
        (3, 3, round(2 / 3, 6), 0.75),
    ]


def test_unpivot_status_metrics_melts_to_rows(spark):
    orders = spark.createDataFrame(
        [(1, 1, "O", 10.0, _d(1), "P"), (2, 1, "O", 30.0, _d(1), "P"),
         (3, 1, "F", 5.0, _d(1), "P")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    rows = aggregations.unpivot_status_metrics(orders).collect()
    got = {(r.o_orderstatus, r.metric): r.value for r in rows}
    assert got == {
        ("F", "sum_price"): 5.0, ("F", "avg_price"): 5.0, ("F", "n_orders"): 1.0,
        ("O", "sum_price"): 40.0, ("O", "avg_price"): 20.0, ("O", "n_orders"): 2.0,
    }


def test_approx_percentile_close_to_exact(spark):
    """Sketch twin tracks the exact percentiles within sketch error on a
    small uniform sample."""
    events = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), 1, "view", float(i % 100), "{}") for i in range(1000)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    [exact] = aggregations.percentile_value_by_type(events).collect()
    [approx] = aggregations.approx_percentile_value_by_type(events).collect()
    assert approx.n_events == exact.n_events == 1000
    assert abs(approx.p50_value - exact.p50_value) <= 1.0
    assert abs(approx.p90_value - exact.p90_value) <= 1.0


def test_grouping_sets_does_not_clobber_caller_views(spark):
    """grouping_sets_revenue used to createOrReplaceTempView a fixed
    name; it now binds the DataFrame as a SQL argument so a caller's
    view of the same name survives (round-5 review)."""
    from parcial_bigdata_spark.operators.aggregations import grouping_sets_revenue

    marker = spark.createDataFrame([(42,)], "marker int")
    marker.createOrReplaceTempView("lineitem_gs")
    li = spark.createDataFrame(
        [("A", "F", 10.0, 0.1), ("N", "O", 20.0, 0.0)],
        "l_returnflag string, l_linestatus string, l_extendedprice double, l_discount double",
    )
    out = grouping_sets_revenue(li)
    assert out.count() == 5  # 2 flags + 2 statuses + grand total
    assert spark.table("lineitem_gs").columns == ["marker"]
    spark.catalog.dropTempView("lineitem_gs")
