"""Join operators: as-of golden semantics, semi/anti, broadcast plans."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from parcial_bigdata_spark.operators import joins


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, 10, minute, 0)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(5)), (2, 100, _ts(20)), (3, 200, _ts(10)), (4, 300, _ts(1))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(0), 1.0), (100, _ts(20), 2.0), (200, _ts(11), 3.0)],
        "user_id long, ts timestamp, px double",
    )
    out = joins.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts", right_vals=["px"]
    )
    got = {r.event_id: r.px for r in out.collect()}
    assert got == {
        1: 1.0,  # latest right at/before 10:05 is 10:00
        2: 2.0,  # equal timestamps match (asof is <=)
        3: None,  # right row at 10:11 is AFTER left 10:10 → no match
        4: None,  # no right rows for user 300
    }


def test_asof_join_single_shuffle(spark):
    """The union+window as-of must shuffle once on the key — no range-
    explosion join (SURVEY.md §2.5 scale rationale)."""
    left = spark.createDataFrame([(1, 100, _ts(5))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(100, _ts(0), 1.0)], "user_id long, ts timestamp, px double")
    plan = (
        joins.asof_join(left, right, "user_id", "ts", "ts", ["px"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_semi_and_anti_join(spark):
    orders = spark.createDataFrame(
        [(1, 10, "O"), (2, 20, "F"), (3, 30, "O")],
        "o_orderkey long, o_custkey long, o_orderstatus string",
    )
    lineitem = spark.createDataFrame(
        [(1, 50.0), (1, 10.0), (2, 10.0)], "l_orderkey long, l_quantity double"
    )
    semi = joins.orders_with_big_items(orders, lineitem, min_qty=45.0).collect()
    assert [(r.o_orderstatus, r.n_orders) for r in semi] == [("O", 1)]

    customer = spark.createDataFrame(
        [(10, "a", 1), (20, "b", 1), (99, "c", 2)],
        "c_custkey long, c_name string, c_nationkey long",
    )
    anti = joins.customers_without_orders(customer, orders).collect()
    assert [r.c_custkey for r in anti] == [99]


def test_dim_join_broadcasts(spark):
    """revenue_by_brand must plan a broadcast-hash join, never shuffle
    the fact side for a dim join."""
    lineitem = spark.createDataFrame(
        [(1, 100.0, 0.1)], "l_partkey long, l_extendedprice double, l_discount double"
    )
    part = spark.createDataFrame([(1, "BrandA")], "p_partkey long, p_brand string")
    plan = (
        joins.revenue_by_brand(lineitem, part)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_session_overlap_pairs_exact_micros(spark):
    """Two users with one overlapping session window (10:00-10:10 vs
    10:05-10:20 → 5 min overlap) and one disjoint session; a third user
    far away contributes nothing.  Bucket-blocked result must equal the
    exact interval-overlap semantics in integer microseconds."""
    import datetime as dt

    from parcial_bigdata_spark.operators.joins import session_overlap_pairs

    t = lambda m: dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # user 1: session A spans 10:00-10:10 (events 0 and 10)
        (1, t(0), 1, "a", 0.0, "{}"), (2, t(10), 1, "a", 0.0, "{}"),
        # user 1: session B spans 11:30-11:35 (> 30 min gap from A)
        (3, t(90), 1, "a", 0.0, "{}"), (4, t(95), 1, "a", 0.0, "{}"),
        # user 2: one session 10:05-10:20 — overlaps A by 5 minutes
        (5, t(5), 2, "a", 0.0, "{}"), (6, t(20), 2, "a", 0.0, "{}"),
        # user 3: session next day
        (7, t(24 * 60), 3, "a", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    out = [(r.user_a, r.user_b, r.n_overlaps, r.total_overlap_us)
           for r in session_overlap_pairs(df).collect()]
    assert out == [(1, 2, 1, 5 * 60 * 1_000_000)]


def test_asof_join_tolerance_nulls_stale_matches(spark):
    """pandas merge_asof semantics for ``tolerance``: a match older than
    the window nulls out while the left row survives (round-5 review:
    the parameter used to be accepted and silently ignored)."""
    left = spark.createDataFrame(
        [(1, 100, _ts(5)), (2, 100, _ts(59))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(0), 1.0)],
        "user_id long, ts timestamp, px double",
    )
    out = joins.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_vals=["px"], tolerance=600.0,  # 10 minutes
    )
    got = {r.event_id: r.px for r in out.collect()}
    assert got == {1: 1.0, 2: None}  # 59 min stale > 10 min window


def test_value_band_join_classifies_every_event(spark):
    """Out-of-band events (negative, >= top edge, null) land in an
    explicit 'unbanded' bucket — totals reconcile with the input row
    count instead of silently dropping rows (round-5 review)."""
    events = spark.createDataFrame(
        [(1, 10.0), (2, 75.0), (3, 999.0), (4, 1000.0), (5, -5.0), (6, None)],
        "event_id long, value double",
    )
    got = {r.band: (r.n_events, r.total_value)
           for r in joins.value_band_join(events).collect()}
    assert got["low"] == (1, 10.0)
    assert got["mid"] == (1, 75.0)
    assert got["high"] == (1, 999.0)
    assert got["unbanded"][0] == 3  # 1000.0 (half-open top), -5.0, null
    assert sum(v[0] for v in got.values()) == 6


def test_asof_join_matches_row_not_forward_filled_values(spark):
    """The matched right ROW travels as a unit: when the latest at-or-
    before right row has a NULL value, the result is NULL (merge_asof /
    ASOF JOIN semantics) — not a value forward-filled from an older row
    that the tolerance gate never checked (round-5 self-review)."""
    left = spark.createDataFrame(
        [(1, 100, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, _ts(0), 5.0), (100, _ts(4), None)],
        "user_id long, ts timestamp, px double",
    )
    out = joins.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts", right_vals=["px"]
    ).collect()
    assert out[0].px is None  # the 10:04 row matched; its px IS null

    # and with tolerance, the AGE check applies to the matched row
    out_tol = joins.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_vals=["px"], tolerance=120.0,
    ).collect()
    assert out_tol[0].px is None


def test_asof_join_right_vals_may_include_right_ts(spark):
    """Asking for the matched timestamp itself (right_vals containing
    the right_ts column) must not collide with internal aliases."""
    left = spark.createDataFrame(
        [(1, 100, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, _ts(3), 7.0)], "user_id long, ts timestamp, px double"
    )
    out = joins.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_vals=["px", "ts"],
    ).collect()
    assert out[0].px == 7.0


def test_asof_join_rejects_reserved_names(spark):
    """'_asof_row'/'_asof_ts'/'_is_left' (union-frame helpers) and '_ts'
    (the matched-struct timestamp field the tolerance gate reads) must be
    rejected on BOTH sides — a right_vals entry named '_ts' would shadow
    the gate's timestamp (round-6 ADVICE item)."""
    left = spark.createDataFrame(
        [(1, 100, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, _ts(0), 1.0)], "user_id long, ts timestamp, _ts double"
    )
    with pytest.raises(ValueError, match="reserved"):
        joins.asof_join(left, right, "user_id", "ts", "ts", ["_ts"])
    bad_left = left.withColumnRenamed("event_id", "_is_left")
    with pytest.raises(ValueError, match="reserved"):
        joins.asof_join(
            bad_left, right.select("user_id", "ts"), "user_id", "ts", "ts", []
        )
