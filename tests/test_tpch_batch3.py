"""Golden tests for the third TPC-H-style batch: Q7 (two-nation trade
volume), Q8 (market share), Q9 (profit by nation/year, adapted cost),
Q11 (important parts), Q13 (customer order-count distribution),
Q16 (supplier variety), Q17 (small-quantity revenue), Q21 (waiting
suppliers)."""

from __future__ import annotations

import datetime as dt

from parcial_bigdata_spark.operators import aggregations, joins


def _d(year: int, month: int = 6, day: int = 1) -> dt.datetime:
    return dt.datetime(year, month, day)


NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
SUPP_SCHEMA = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
)
ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string"
)


def test_nation_trade_volume_directions_and_window(spark):
    nation = spark.createDataFrame(
        [(1, "NATION_3", 0), (2, "NATION_8", 0), (3, "NATION_9", 0)], NATION_SCHEMA
    )
    supplier = spark.createDataFrame(
        [(1, "s1", 1, 0.0), (2, "s2", 2, 0.0), (3, "s3", 3, 0.0)], SUPP_SCHEMA
    )
    customer = spark.createDataFrame(
        [(10, "c10", 2, 0.0, "X"), (20, "c20", 1, 0.0, "X")], CUST_SCHEMA
    )
    orders = spark.createDataFrame(
        [(100, 10, "O", 0.0, _d(1996), "P"), (200, 20, "O", 0.0, _d(1996), "P")],
        ORDERS_SCHEMA,
    )
    lineitem = spark.createDataFrame(
        [
            # s1(NATION_3) → c10(NATION_8): counted, 1996
            (100, 1, 100.0, 0.0, _d(1996, 7)),
            # s3(NATION_9) → c10: supplier outside the pair → dropped
            (100, 3, 999.0, 0.0, _d(1996, 7)),
            # s2(NATION_8) → c20(NATION_3): counted, 1997
            (200, 2, 200.0, 0.5, _d(1997, 3)),
            # s1 → c20: both NATION_3 → same-nation, dropped
            (200, 1, 500.0, 0.0, _d(1997, 3)),
            # s1 → c10 but shipped outside window → dropped
            (100, 1, 50.0, 0.0, _d(1998, 2)),
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    rows = joins.nation_trade_volume(nation, customer, supplier, orders, lineitem).collect()
    assert [(r.supp_nation, r.cust_nation, r.l_year, r.revenue) for r in rows] == [
        ("NATION_3", "NATION_8", 1996, 100.0),
        ("NATION_8", "NATION_3", 1997, 100.0),
    ]


def test_market_share_conditional_ratio(spark):
    region = spark.createDataFrame([(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(1, "NATION_5", 1), (2, "NATION_6", 1), (3, "NATION_7", 0)], NATION_SCHEMA
    )
    # customers in ASIA (nation 3) qualify; suppliers from any nation
    customer = spark.createDataFrame([(10, "c10", 3, 0.0, "X")], CUST_SCHEMA)
    supplier = spark.createDataFrame([(1, "s1", 1, 0.0), (2, "s2", 2, 0.0)], SUPP_SCHEMA)
    part = spark.createDataFrame(
        [(1, "p", "Brand#1", "ECONOMY", 1, 10.0), (2, "p", "Brand#1", "LARGE", 1, 10.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, "
        "p_retailprice double",
    )
    orders = spark.createDataFrame([(100, 10, "O", 0.0, _d(1996), "P")], ORDERS_SCHEMA)
    lineitem = spark.createDataFrame(
        [
            (100, 1, 1, 75.0, 0.0, _d(1996, 7)),   # target-nation supplier, ECONOMY
            (100, 1, 2, 225.0, 0.0, _d(1996, 7)),  # other supplier, ECONOMY
            (100, 2, 2, 500.0, 0.0, _d(1996, 7)),  # LARGE part → dropped
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    [row] = joins.market_share(
        region, nation, customer, supplier, orders, lineitem, part
    ).collect()
    assert (row.o_year, row.mkt_share) == (1996, 0.25)


def test_profit_by_nation_year_cost_model(spark):
    nation = spark.createDataFrame([(1, "NATION_0", 0)], NATION_SCHEMA)
    supplier = spark.createDataFrame([(1, "s1", 1, 0.0)], SUPP_SCHEMA)
    part = spark.createDataFrame(
        [(1, "red widget", "Brand#1", "PROMO", 1, 10.0),
         (2, "blue bolt", "Brand#1", "PROMO", 1, 10.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, "
        "p_retailprice double",
    )
    orders = spark.createDataFrame([(100, 10, "O", 0.0, _d(1995), "P")], ORDERS_SCHEMA)
    lineitem = spark.createDataFrame(
        # profit = 100*(1-0.1) - 0.6*10.0*5 = 90 - 30 = 60; blue bolt dropped
        [(100, 1, 1, 5.0, 100.0, 0.1), (100, 2, 1, 5.0, 100.0, 0.1)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    rows = joins.profit_by_nation_year(nation, supplier, orders, lineitem, part).collect()
    assert [(r.nation, r.o_year, r.sum_profit) for r in rows] == [("NATION_0", 1995, 60.0)]


def test_important_parts_mean_relative_threshold(spark):
    lineitem = spark.createDataFrame(
        # part values: 1 → 100, 2 → 400, 3 → 100; mean = 200, 1.2×mean = 240
        [(1, 100.0, 0.0), (2, 300.0, 0.0), (2, 100.0, 0.0), (3, 100.0, 0.0)],
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    rows = aggregations.important_parts_by_value(lineitem).collect()
    assert [(r.l_partkey, r.part_value) for r in rows] == [(2, 400.0)]


def test_supplier_variety_distinct_and_exclusions(spark):
    part = spark.createDataFrame(
        [
            (1, "p", "Brand#2", "LARGE", 5, 1.0),
            (2, "p", "Brand#1", "LARGE", 5, 1.0),    # excluded brand
            (3, "p", "Brand#2", "PROMO", 5, 1.0),    # excluded type
            (4, "p", "Brand#2", "LARGE", 7, 1.0),    # size not in set
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, "
        "p_retailprice double",
    )
    lineitem = spark.createDataFrame(
        # part 1 served by suppliers {1, 2} (2 twice → distinct); excluded parts ignored
        [(1, 1), (1, 2), (1, 2), (2, 3), (3, 3), (4, 3)],
        "l_partkey long, l_suppkey long",
    )
    rows = joins.supplier_variety(lineitem, part).collect()
    assert [(r.p_brand, r.p_type, r.p_size, r.supplier_cnt) for r in rows] == [
        ("Brand#2", "LARGE", 5, 2)
    ]


def test_small_quantity_revenue_per_part_threshold(spark):
    part = spark.createDataFrame(
        [(1, "p", "Brand#23", "LARGE", 5, 1.0), (2, "p", "Brand#9", "LARGE", 5, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, "
        "p_retailprice double",
    )
    lineitem = spark.createDataFrame(
        # part 1: avg qty = 20, limit = 10 → only the qty-5 row (70.0) qualifies
        [(1, 5.0, 70.0), (1, 35.0, 999.0), (2, 1.0, 888.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    [row] = joins.small_quantity_revenue(lineitem, part).collect()
    assert row.avg_yearly == 10.0  # 70 / 7


def test_waiting_suppliers_sole_late_on_multi_supplier_order(spark):
    supplier = spark.createDataFrame(
        [(1, "Supplier#1", 0, 0.0), (2, "Supplier#2", 0, 0.0)], SUPP_SCHEMA
    )
    orders = spark.createDataFrame(
        [
            (100, 1, "F", 0.0, _d(1996), "P"),  # multi-supplier, s1 only late → counted
            (200, 1, "F", 0.0, _d(1996), "P"),  # both suppliers late → nobody counted
            (300, 1, "F", 0.0, _d(1996), "P"),  # single-supplier → not counted
            (400, 1, "O", 0.0, _d(1996), "P"),  # not finalized → ignored
        ],
        ORDERS_SCHEMA,
    )
    late, ontime = _d(1996, 9), _d(1996, 6, 15)
    lineitem = spark.createDataFrame(
        [
            (100, 1, late), (100, 1, late), (100, 2, ontime),
            (200, 1, late), (200, 2, late),
            (300, 1, late),
            (400, 1, late), (400, 2, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    rows = joins.waiting_suppliers(supplier, orders, lineitem).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("Supplier#1", 1)]


def test_customer_order_distribution_counts_zero(spark):
    customer = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "X"), (2, "c2", 0, 0.0, "X"), (3, "c3", 0, 0.0, "X")],
        CUST_SCHEMA,
    )
    orders = spark.createDataFrame(
        [
            (100, 1, "O", 0.0, _d(1996), "2-HIGH"),
            (101, 1, "O", 0.0, _d(1996), "2-HIGH"),
            (102, 2, "O", 0.0, _d(1996), "1-URGENT"),  # excluded priority → c2 counts 0
        ],
        ORDERS_SCHEMA,
    )
    rows = joins.customer_order_distribution(customer, orders).collect()
    # c1 → 2 orders; c2, c3 → 0 orders
    assert [(r.c_count, r.custdist) for r in rows] == [(0, 2), (2, 1)]
