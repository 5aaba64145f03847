"""Window-function operators over the events time-series.

The reference has no OVER clauses (SURVEY.md §2.6); its natural
extension — day-over-day delta on the dolar series — generalizes here to
per-user deltas / rankings / running totals on ``events``.

Scale: every window is partitioned by a high-cardinality key (user_id),
so state per partition stays bounded; there is exactly one shuffle on the
partition key per window spec.  All orderings carry ``event_id`` as a
tie-break so results are deterministic (oracle-comparable) even when
timestamps collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parcial_bigdata_spark.functions.money import ratio_round


def _user_ts_window() -> Window:
    return Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())


def value_delta(events: DataFrame) -> DataFrame:
    """lag(): change vs the user's previous event (the reference series'
    day-over-day delta, SURVEY.md §2.6)."""
    w = _user_ts_window()
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") - F.lag("value", 1).over(w), 2).alias("delta"),
    )


def top_events_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group via row_number ≤ k — the distributed top-k idiom:
    rank within each user partition, filter early, never a global sort."""
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        events.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("user_id", "rnk", "event_id", "value")
    )


def running_total(events: DataFrame) -> DataFrame:
    """Running per-user sum (rowsBetween unboundedPreceding..current)."""
    w = _user_ts_window().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def sessions_unordered(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag(ts) + cumulative gap counter: a new session
    starts when the in-user gap exceeds ``gap_minutes``.  Two stacked
    windows on the same (user_id, ts) spec → one shuffle total.  No
    output ordering — composing operators (session_overlap_pairs) build
    on this so the presentation sort never lands mid-plan as a useless
    range exchange."""
    w = _user_ts_window()
    gap_us = gap_minutes * 60 * 1_000_000
    # Integer microseconds: exact gap arithmetic (oracle: epoch_us).
    new_sess = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts")), 1, None).over(w) > gap_us
    )
    sess_id = F.sum(F.when(new_sess, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.withColumn("session_seq", sess_id)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """``sessions_unordered`` with the presentation sort (the query
    surface / oracle twin)."""
    return sessions_unordered(events, gap_minutes).orderBy("user_id", "session_seq")


def daily_delta(events: DataFrame) -> DataFrame:
    """Day-over-day change of the daily mean value — the reference
    series' natural lag() extension (SURVEY.md §2.6) lifted to the events
    table.  The agg shrinks data to |days| rows first, so the unkeyed
    lag window is a single tiny partition by construction (safe here;
    partition by series key when there are many series)."""
    daily = events.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.round(F.avg("value"), 4).alias("avg_value")
    )
    w = Window.orderBy(F.col("d").asc())
    return daily.select(
        "d",
        "avg_value",
        F.round(F.col("avg_value") - F.lag("avg_value", 1).over(w), 4).alias("delta"),
    ).orderBy("d")


def user_bookends(events: DataFrame) -> DataFrame:
    """Per-user FIRST and LAST event (type + value) with event count —
    the first_value/last_value window shape, computed as struct argmin/
    argmax in ONE map-side-combining groupBy instead of a window: a
    window over (user, full history) funnels each user's whole timeline
    through one task, while min/max(struct(ts, event_id, payload))
    partial-aggregates to two structs per user per input partition
    before the shuffle — the only form that survives a power-user at
    100 TB.  (ts, event_id) is a total order, so both ends are
    deterministic."""
    first = F.min(
        F.struct("ts", "event_id", "event_type", "value")
    ).alias("f")
    last = F.max(
        F.struct("ts", "event_id", "event_type", "value")
    ).alias("l")
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), first, last)
        .select(
            "user_id",
            "n_events",
            F.col("f.event_type").alias("first_type"),
            F.col("f.value").alias("first_value"),
            F.col("l.event_type").alias("last_type"),
            F.col("l.value").alias("last_value"),
            (
                F.unix_micros(F.col("l.ts")) - F.unix_micros(F.col("f.ts"))
            ).alias("span_us"),
        )
        .orderBy("user_id")
    )


def time_weighted_avg(events: DataFrame) -> DataFrame:
    """Per-user TIME-WEIGHTED average of ``value`` (the TWAP shape —
    TimescaleDB's ``time_weight``): each observation holds until the
    next one, so its weight is the micros until the user's next event
    (left-constant interpolation; the final observation spans nothing
    and is excluded).  Users whose events all share one timestamp have
    zero span and drop out.

    One user-keyed shuffle: the lead() window and the closing groupBy
    share the ``user_id`` exchange.  The numerator Σ value·Δt is EXACT
    — DECIMAL(18,2) value times bigint micros — with doubles entering
    only at the final division, so the DuckDB oracle is bit-identical
    (the ``money_sum`` pattern)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.unix_micros(F.lead("ts", 1).over(w)) - F.unix_micros(F.col("ts"))
    per = events.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        dt.alias("dt"),
    ).where(F.col("dt").isNotNull())
    return (
        per.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt").alias("span_us"),
            F.sum(F.col("v") * F.col("dt")).alias("vdt"),
        )
        .where(F.col("span_us") > 0)
        .select(
            "user_id",
            "n_intervals",
            "span_us",
            ratio_round(
                F.col("vdt").cast("double") / F.col("span_us").cast("double"),
                6,
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user linear trend (OLS slope of value over time) with the
    built-in regr_slope aggregate — one partial+final pass, no UDF."""
    x = F.unix_micros(F.col("ts")).cast("double") / 86_400_000_000.0  # days
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.regr_slope(F.col("value"), x), 4).alias("slope_per_day"),
        )
        .orderBy("user_id")
    )


def user_value_trend_pandas(events: DataFrame) -> DataFrame:
    """Grouped-pandas-UDF twin of user_value_trend via applyInPandas —
    the escape hatch for per-group logic built-ins cannot express
    (here: plain OLS, so the two must agree; asserted in tests).
    Each group arrives as one pandas DataFrame; state is bounded by the
    largest single group, not the partition."""
    import numpy as np
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["ts"].astype("int64").to_numpy() / 1e9 / 86_400.0
        y = pdf["value"].to_numpy()
        if len(pdf) > 1 and np.ptp(x) > 0:
            slope = float(np.polyfit(x, y, 1)[0])
        else:
            slope = float("nan")
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "n_events": [len(pdf)],
             "slope_per_day": [round(slope, 4)]}
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fit, schema="user_id long, n_events long, slope_per_day double")
        .orderBy("user_id")
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding 1-hour/30-minute window counts in batch (each event lands
    in exactly window/slide = 2 windows).  ``F.window`` materializes the
    overlap as a compact internal explode — no self-join, no UDF."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window aggregate (batch flavor of the streaming
    windowed agg, SURVEY.md §2.9 ST7).  ``F.window`` buckets without a
    per-row UDF; equivalent to date_trunc('hour')."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def gapfill_daily_series(
    events: DataFrame,
    event_type: str = "purchase",
    min_value: float = 120.0,
    max_users: int = 40,
) -> DataFrame:
    """Time-series resample + gap-fill: daily max value per user on a
    dense day grid, missing days carried forward from the last observed
    value (nulls before the first observation).

    The dense grid is built with ``sequence()`` over the global [min,max]
    day span (a 1-row aggregate broadcast into the per-user cross join) —
    no driver collect.  The carry-forward is ``last(ignorenulls)`` over a
    per-user window: one shuffle on user_id, linear state.  This is the
    standard Spark formulation of a hypertable ``time_bucket_gapfill`` /
    ``locf`` rollup.
    """
    obs = (
        events.where(
            (F.col("event_type") == event_type)
            & (F.col("value") > min_value)
            & (F.col("user_id") < max_users)
        )
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.round(F.max("value"), 2).alias("max_value"))
    )
    span = events.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    users = obs.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(days))
    filled = grid.join(obs, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        filled.select(
            "user_id",
            # midnight timestamp, not DATE: the oracle-compare convention for
            # day buckets (DateType and DuckDB DATE render differently)
            F.col("day").cast("timestamp").alias("day"),
            F.last("max_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("max_value").isNotNull().alias("observed"),
        )
        .orderBy("user_id", "day")
    )


def order_price_rank_bands(orders: DataFrame) -> DataFrame:
    """Ranking-family windows per order status: ntile quartile,
    percent_rank, and cume_dist over total price, returned for the top-3
    rows per status by rank.  One shuffle on the partition key; the
    per-status sort is the unavoidable cost of ranking semantics.
    Ordering carries o_orderkey as tie-break for determinism."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    ranked = orders.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        ranked.where(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("o_orderstatus", F.col("o_totalprice").desc(), "o_orderkey")
    )


def time_range_moving_avg(events: DataFrame, window_seconds: int = 3600) -> DataFrame:
    """RANGE-frame window: per user, the average of values in the
    trailing ``window_seconds`` of EVENT TIME (not row count) — the
    moving-average shape row frames cannot express when events arrive
    unevenly.  Spark range frames need a numeric ordering key, so the
    frame is declared over epoch microseconds; one shuffle on user_id."""
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value"), 2).alias("value"),
        F.round(F.avg("value").over(w), 4).alias("trailing_avg"),
        F.count("*").over(w).alias("trailing_n"),
    ).orderBy("user_id", "ts", "event_id")


def ewma_smooth(
    events: DataFrame, alpha: float = 0.3, k: int = 8
) -> DataFrame:
    """Truncated exponentially-weighted moving average of ``value`` per
    user over event order — the standard time-series smoothing feature
    (trend estimate + deviation-from-trend anomaly signal).

    Semantics: weights ``alpha·(1-alpha)^j`` over the current event and
    its ``k-1`` predecessors, truncated (missing lags contribute 0, no
    renormalization) — a FIXED finite-impulse formulation rather than
    the recursive infinite one, chosen deliberately: every row costs k
    fused lag() reads inside ONE window pass (no recursion, no UDF, no
    per-row state), and an oracle can reproduce it term-for-term.

    Arithmetic is exact DECIMAL end-to-end (the ``money_sum`` rule):
    ``value`` recovers exactly at DECIMAL(18,2); alpha is interpreted
    as its shortest decimal repr, so every weight ``alpha·(1-alpha)^j``
    is a terminating decimal literal both engines parse identically;
    products and sums are exact; the final round(6) happens in decimal
    space where Spark and DuckDB share half-away-from-zero ties.  A
    first double-based cut produced 4-23 per-100k boundary mismatches
    (engines round binary doubles near decimal midpoints differently);
    decimal removes the entire class, at FIR-tap cost only.

    Scale shape: one shuffle on user_id (the same exchange every other
    per-user window op reuses); k is a constant — cost is O(k) per row,
    never O(history).
    """
    from decimal import Decimal

    if not 0.0 < alpha < 1.0:
        raise ValueError("ewma_smooth: alpha must be in (0, 1)")
    if k <= 0:
        raise ValueError("ewma_smooth: k must be positive")
    a = Decimal(repr(alpha))
    one_minus = Decimal(1) - a
    w = _user_ts_window()
    v = F.col("value").cast("decimal(18,2)")
    ewma = None
    for j in range(k):
        weight = a * one_minus**j  # exact decimal, both engines parse it
        term = F.coalesce(F.lag(v, j).over(w), F.lit(Decimal(0))) * F.lit(weight)
        ewma = term if ewma is None else ewma + term
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(ewma, 6).cast("double").alias("ewma"),
        F.round(v - ewma, 6).cast("double").alias("deviation"),
    )


def user_drawdown(events: DataFrame) -> DataFrame:
    """Per-user maximum drawdown of the value series: the largest drop
    from a running peak to a later observation — the risk statistic
    every financial/metrics dashboard tracks.  Exact throughout: value
    rides as DECIMAL(18,2), the running peak is a max window (no
    floats), and the drawdown subtraction stays decimal until the
    output cast.

    One user-keyed shuffle shared by the running-max window and the
    closing groupBy (the TWAP plan shape)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col("value").cast("decimal(18,2)")
    per = events.select(
        "user_id",
        v.alias("v"),
        F.max(v).over(w).alias("peak"),
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("peak").cast("double").alias("peak_value"),
            F.max(F.col("peak") - F.col("v")).cast("double").alias(
                "max_drawdown"
            ),
        )
        .orderBy("user_id")
    )


def rolling_median(events: DataFrame, frame: int = 7) -> DataFrame:
    """Exact rolling median of ``value`` over the trailing ``frame``
    rows per user (`window_rolling_median`) — the robust smoother for
    a spiky per-user metric, where the rolling MEAN chases every
    outlier the median ignores.

    ``frame`` must be ODD and rows are emitted only once the frame is
    FULL (row_number ≥ frame): an odd, full frame makes the median the
    exact middle ELEMENT of the sorted window — never an interpolated
    average of two — so the output is always one of the input doubles
    and bit-identical across engines (DuckDB's ``quantile_cont`` hits
    the same element exactly at h = (n−1)/2 integral).

    Scale: one shuffle on the high-cardinality user key shared by both
    window specs; the per-row sorted-frame work is O(frame·log frame)
    on a constant-size array (``collect_list`` over a bounded ROWS
    frame, sorted row-locally), never a per-partition re-sort."""
    if frame % 2 == 0:
        raise ValueError(f"frame must be odd for an exact median, got {frame}")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-(frame - 1), 0)
    mid = (frame + 1) // 2
    return (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.col("value").cast("double").alias("value"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "rolling_median",
            F.element_at(F.array_sort(F.collect_list("value").over(wf)), mid),
        )
        .where(F.col("__rn") >= frame)
        .drop("__rn")
        .orderBy("user_id", "ts", "event_id")
    )
