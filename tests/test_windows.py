"""Window operators: golden-exact on a tiny two-user event stream."""

from __future__ import annotations

import datetime as dt

import pytest

from parcial_bigdata_spark.operators import windows as win


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, 10, minute, 0)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: three events in one session, one 40-min-gap later
        (1, 1, _ts(0), "click", 10.0),
        (2, 1, _ts(5), "click", 30.0),
        (3, 1, _ts(10), "purchase", 20.0),
        (4, 1, _ts(50), "click", 5.0),
        # user 2: single event
        (5, 2, _ts(0), "signup", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_value_delta(events):
    got = {r.event_id: r.delta for r in win.value_delta(events).collect()}
    assert got == {1: None, 2: 20.0, 3: -10.0, 4: -15.0, 5: None}


def test_top_events_per_user(events):
    got = [(r.user_id, r.rnk, r.event_id) for r in
           win.top_events_per_user(events, k=2).orderBy("user_id", "rnk").collect()]
    assert got == [(1, 1, 2), (1, 2, 3), (2, 1, 5)]


def test_running_total(events):
    got = {r.event_id: r.running_value for r in win.running_total(events).collect()}
    assert got == {1: 10.0, 2: 40.0, 3: 60.0, 4: 65.0, 5: 1.0}


def test_sessionize_gap_splits(events):
    out = win.sessionize(events, gap_minutes=30).collect()
    got = [
        (r.user_id, r.session_seq, r.n_events, r.session_start, r.session_end, r.session_value)
        for r in out
    ]
    assert got == [
        (1, 0, 3, _ts(0), _ts(10), 60.0),
        (1, 1, 1, _ts(50), _ts(50), 5.0),
        (2, 0, 1, _ts(0), _ts(0), 1.0),
    ]


def test_hourly_rollup(events):
    out = win.hourly_rollup(events).collect()
    got = [(r.window_start, r.event_type, r.n_events, r.total_value) for r in out]
    hour = dt.datetime(2025, 1, 1, 10, 0, 0)
    assert got == [
        (hour, "click", 3, 45.0),
        (hour, "purchase", 1, 20.0),
        (hour, "signup", 1, 1.0),
    ]


def test_windows_share_one_shuffle(spark, events):
    """sessionize stacks two window specs on the same (user_id, ts) key —
    the plan must contain exactly one Exchange for them (SURVEY.md §4)."""
    plan = win.sessionize(events)._jdf.queryExecution().optimizedPlan().toString()
    # one shuffle for the windows; the final groupBy reuses the same
    # hash-partitioning on user_id so no extra exchange is needed for it
    assert plan.count("Window") <= 2


def test_user_trend_builtin_equals_pandas(events):
    builtin = win.user_value_trend(events).collect()
    pandas_v = win.user_value_trend_pandas(events).collect()
    assert [(r.user_id, r.n_events, r.slope_per_day) for r in builtin] == [
        (r.user_id, r.n_events, r.slope_per_day) for r in pandas_v
    ]
    # user 2 has one event -> undefined slope on both paths
    one = {r.user_id: r.slope_per_day for r in builtin}[2]
    import math
    assert one is None or math.isnan(one)


def test_sliding_counts_each_event_in_two_windows(events):
    out = win.sliding_counts(events).collect()
    total = sum(r.n_events for r in out)
    assert total == 2 * events.count()  # 1h window / 30m slide
    clicks_at_10 = [
        r for r in out
        if r.event_type == "click" and r.window_start == dt.datetime(2025, 1, 1, 10, 0)
    ]
    assert clicks_at_10[0].n_events == 3  # clicks at :00, :05, :50 all in [10:00, 11:00)


def test_time_range_moving_avg_uses_event_time_not_rows(spark):
    """Events at :00, :30, :90 min with a 60-min trailing window: the
    third event's frame holds only itself + the :30 event."""
    import datetime as dt

    from parcial_bigdata_spark.operators.windows import time_range_moving_avg

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, 7, "a", 10.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 7, "a", 20.0, "{}"),
        (3, t0 + dt.timedelta(minutes=90), 7, "a", 40.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    out = {r.event_id: (r.trailing_avg, r.trailing_n)
           for r in time_range_moving_avg(df, window_seconds=3600).collect()}
    assert out == {1: (10.0, 1), 2: (15.0, 2), 3: (30.0, 2)}


def test_revenue_share_sums_to_one(spark):
    from parcial_bigdata_spark.operators.aggregations import revenue_share_by_priority

    df = spark.createDataFrame(
        [(1, 1, "O", 100.0, None, "1-URGENT"), (2, 1, "O", 300.0, None, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    out = {r.o_orderpriority: r.share for r in revenue_share_by_priority(df).collect()}
    assert out == {"1-URGENT": 0.25, "5-LOW": 0.75}


def _window_sits_above_aggregate(df) -> bool:
    """True iff every Window node in the optimized plan has an Aggregate
    somewhere BELOW it — i.e. the unkeyed window runs over an already-
    reduced frame (|days| / |priorities| rows), never over raw facts."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    win_idx = [i for i, ln in enumerate(lines) if "Window " in ln or ln.strip().startswith("Window")]
    agg_idx = [i for i, ln in enumerate(lines) if "Aggregate" in ln]
    assert win_idx, "expected a Window node in the plan"
    return all(any(a > w for a in agg_idx) for w in win_idx)


def test_daily_delta_window_is_post_aggregation(spark):
    """Round-3 verdict item 5: the unkeyed lag window is safe only
    because the frame is the |days|-row aggregate; pin that shape."""
    import datetime as dt

    from parcial_bigdata_spark.operators.windows import daily_delta

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 7, "a", 10.0, "{}"),
         (2, dt.datetime(2024, 1, 2), 7, "a", 30.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = daily_delta(df)
    assert _window_sits_above_aggregate(out)
    deltas = {r.d.day: r.delta for r in out.collect()}
    assert deltas == {1: None, 2: 20.0}


def test_revenue_share_window_is_post_aggregation(spark):
    from parcial_bigdata_spark.operators.aggregations import revenue_share_by_priority

    df = spark.createDataFrame(
        [(1, 1, "O", 100.0, None, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    assert _window_sits_above_aggregate(revenue_share_by_priority(df))


# ------------------------------------------------------------- ewma

def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, m), u, "t", v, "{}")
         for i, (m, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


def test_time_weighted_avg_hand_computed(events):
    """Left-constant TWAP: user 1 holds 10 for 5 min, 30 for 5 min,
    20 for 40 min → (10·5 + 30·5 + 20·40) / 50 = 20.0; the final event
    spans nothing; single-event user 2 has zero span and drops out."""
    rows = {r.user_id: r for r in win.time_weighted_avg(events).collect()}
    assert set(rows) == {1}
    r = rows[1]
    assert r.n_intervals == 3
    assert r.span_us == 50 * 60 * 1_000_000
    assert r.twap == pytest.approx((10 * 5 + 30 * 5 + 20 * 40) / 50)


def test_time_weighted_avg_zero_span_and_ties(spark):
    """All-simultaneous events: dt = 0 everywhere → user excluded (no
    division by zero); a tie mid-stream contributes zero weight but
    does not break the chain."""
    import datetime as dtm

    base = dtm.datetime(2025, 1, 1)
    df = spark.createDataFrame(
        [
            (1, 7, base, "t", 100.0),
            (2, 7, base, "t", 200.0),           # same instant
            (3, 8, base, "t", 5.0),
            (4, 8, base, "t", 999.0),            # tie: weight 0
            (5, 8, base + dtm.timedelta(seconds=10), "t", 1.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    rows = {r.user_id: r for r in win.time_weighted_avg(df).collect()}
    assert set(rows) == {8}
    # user 8: event 3 holds 0s (tie), event 4 holds 10s → twap = 999
    assert rows[8].twap == pytest.approx(999.0)


def test_ewma_hand_computed(spark):
    # alpha=0.5, k=2: weights 0.5, 0.25 — truncated, no renormalization
    out = {
        r.event_id: r
        for r in win.ewma_smooth(
            _ev(spark, [(0, 7, 10.0), (1, 7, 20.0), (2, 7, 40.0)]),
            alpha=0.5, k=2,
        ).collect()
    }
    assert out[0].ewma == pytest.approx(5.0)           # 0.5·10 (no lag)
    assert out[1].ewma == pytest.approx(12.5)          # 0.5·20 + 0.25·10
    assert out[2].ewma == pytest.approx(25.0)          # 0.5·40 + 0.25·20
    assert out[2].deviation == pytest.approx(15.0)     # 40 − 25


def test_ewma_per_user_isolation_and_null_value(spark):
    # users never see each other's history; NULL value contributes 0
    out = {
        r.event_id: r
        for r in win.ewma_smooth(
            _ev(spark, [(0, 1, 8.0), (1, 2, 100.0), (2, 1, None)]),
            alpha=0.5, k=2,
        ).collect()
    }
    assert out[1].ewma == pytest.approx(50.0)          # user 2 sees only itself
    assert out[2].ewma == pytest.approx(2.0)           # 0.5·0 + 0.25·8
    assert out[2].deviation is None                    # NULL value − ewma


def test_ewma_single_window_pass(spark):
    plan = (
        win.ewma_smooth(_ev(spark, [(0, 1, 1.0)]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1


def test_ewma_validates_inputs(spark):
    df = _ev(spark, [(0, 1, 1.0)])
    with pytest.raises(ValueError, match="alpha"):
        win.ewma_smooth(df, alpha=1.0)
    with pytest.raises(ValueError, match="k must"):
        win.ewma_smooth(df, k=0)


def test_user_bookends_argmin_struct(events):
    """First/last by the (ts, event_id) total order: user 1 spans
    events 1→4 (50 min), user 2 is a single-event degenerate span."""
    rows = {r.user_id: r for r in win.user_bookends(events).collect()}
    u1, u2 = rows[1], rows[2]
    assert (u1.n_events, u1.first_type, u1.first_value) == (4, "click", 10.0)
    assert (u1.last_type, u1.last_value) == ("click", 5.0)
    assert u1.span_us == 50 * 60 * 1_000_000
    assert (u2.n_events, u2.span_us) == (1, 0)
    assert (u2.first_type, u2.last_type) == ("signup", "signup")


def test_user_drawdown_running_peak(events):
    """user 1 values 10,30,20,5 → peaks 10,30,30,30 → max drawdown 25;
    single-event user 2 has drawdown 0."""
    rows = {r.user_id: r for r in win.user_drawdown(events).collect()}
    assert (rows[1].peak_value, rows[1].max_drawdown) == (30.0, 25.0)
    assert (rows[2].peak_value, rows[2].max_drawdown) == (1.0, 0.0)


def test_rolling_median_exact_middle_element(spark):
    vals = [5.0, 1.0, 9.0, 2.0, 8.0, 3.0, 7.0, 4.0, 6.0]
    df = spark.createDataFrame(
        [(i, 1, _ts(i), "x", v) for i, v in enumerate(vals)],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )
    rows = win.rolling_median(df).collect()
    # emitted only once the 7-row frame is full: 3 of 9 rows; the
    # median is the 4th smallest of the trailing 7, not the row value
    assert [r.value for r in rows] == [7.0, 4.0, 6.0]
    assert [r.rolling_median for r in rows] == [5.0, 4.0, 6.0]


def test_rolling_median_rejects_even_frame(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0), "x", 1.0)],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )
    with pytest.raises(ValueError, match="odd"):
        win.rolling_median(df, frame=6)
