"""Aggregation operators.

The reference has only envelope/accounting counts (SURVEY.md §2.4:
A1-A4); the declared capability surface adds the full Spark aggregation
set: grouped aggs, distinct counts, rollup/cube, approximate sketches.

Scale notes: every aggregate here is expressed with built-in functions so
Spark plans a partial (map-side) HashAggregate before the shuffle — the
shuffle carries one row per (partition × group), not per input row.
Monetary sums are rounded at the OUTPUT edge only, never mid-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parcial_bigdata_spark.functions.money import money_sum


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Capability parity for grouped multi-aggregate (SURVEY.md §2.4): 2
    grouping columns, 8 aggregates, ordered output.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge, cast="decimal(18,6)").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_forecast(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6-style scan-heavy filter + single aggregate.

    The headline bench query for scan throughput: predicate pushes to
    parquet row-group stats, projection prunes to 4 columns, aggregate is
    a single partial+final sum (no groups → one-row shuffle).
    """
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


def distinct_customers_per_status(orders: DataFrame) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase aggregate (distinct
    partial per partition, then merge) with no row explosion."""
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


def approx_distinct_parts(lineitem: DataFrame, rsd: float = 0.01) -> DataFrame:
    """HyperLogLog++ sketch — the 100 TB substitute for exact distinct.
    No SQL oracle (approximate by design); paired with the exact count in
    tests for a tolerance check.

    Percentiles are emitted as scalar columns (p50/p95/p99), not an
    array<double>, so downstream order-insensitive hashing works on the
    result (atomic cells only at the output edge)."""
    pcts = F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99))")
    return lineitem.agg(
        F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
        pcts.alias("_pcts"),
    ).select(
        "approx_parts",
        F.col("_pcts")[0].alias("p50"),
        F.col("_pcts")[1].alias("p95"),
        F.col("_pcts")[2].alias("p99"),
    )


def rollup_order_totals(orders: DataFrame) -> DataFrame:
    """ROLLUP over (status, priority): per-group totals + subtotals +
    grand total in one pass (Spark Expand operator → single shuffle)."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            money_sum("o_totalprice").alias("total_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def cube_lineitem_counts(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            money_sum("l_quantity").alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def stats_price_by_status(orders: DataFrame) -> DataFrame:
    """Statistical aggregate family: mean/stddev/min/max/exact median per
    group — one partial+final pass; the exact percentile aggregates the
    value multiset per group (fine for bounded groups; use
    approx_percentile at unbounded cardinality)."""
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            # the interpolated median of 2-decimal money lands on exact
            # 3-decimal halves (midpoint of an odd cent sum) — recover
            # the exact value at scale 3, round half-away in decimal
            F.round(
                F.percentile("o_totalprice", F.lit(0.5)).cast("decimal(18,3)"), 2
            )
            .cast("double")
            .alias("median_price"),
        )
        .orderBy("o_orderstatus")
    )


ORDER_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def pivot_priority_counts(orders: DataFrame) -> DataFrame:
    """PIVOT: priorities become columns.  The value list is explicit, so
    Spark skips the extra distinct-values job and the output schema is
    static (required for oracle comparison and for sane plans at scale)."""
    pivoted = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ORDER_PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(p) for p in ORDER_PRIORITIES],
    ).orderBy("o_orderstatus")


def unpivot_status_metrics(orders: DataFrame) -> DataFrame:
    """UNPIVOT (melt): per-status metric columns become (metric, value)
    rows — the inverse of the pivot operator.  ``unpivot`` is a
    row-local Expand (each input row fans out to one row per metric),
    so the only shuffle is the upstream per-status aggregate; value
    columns share one type (double) as the operator requires."""
    agg = orders.groupBy("o_orderstatus").agg(
        money_sum("o_totalprice").alias("sum_price"),
        F.round(F.avg("o_totalprice").cast("decimal(18,4)"), 2)
        .cast("double")
        .alias("avg_price"),
        F.count("*").cast("double").alias("n_orders"),
    )
    return agg.unpivot(
        ["o_orderstatus"],
        ["sum_price", "avg_price", "n_orders"],
        "metric",
        "value",
    ).orderBy("o_orderstatus", "metric")


def grouping_sets_revenue(lineitem: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-returnflag,
    per-linestatus, and grand total in one Expand pass.  The DataFrame
    binds into the SQL as a named argument — no temp-view registration,
    so nothing in the caller's catalog gets clobbered and concurrent
    calls cannot race."""
    return lineitem.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_rows
        FROM {lineitem}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """,
        lineitem=lineitem,
    )


def top_orders_by_price(orders: DataFrame, k: int = 10) -> DataFrame:
    """Global top-k: ORDER BY ... LIMIT k plans as TakeOrderedAndProject —
    each partition keeps only its local top-k, the driver merges k×P rows,
    no global sort.  Tie-broken on the key for determinism."""
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(k)
    )


def percentile_value_by_type(events: DataFrame) -> DataFrame:
    """Exact percentiles (median / p90) of event value per type.

    Uses the exact ``percentile`` aggregate (linear interpolation —
    identical semantics to ANSI ``percentile_cont`` / DuckDB
    ``quantile_cont``).  Exact percentiles sort within each group; at
    100 TB the approx twin (``percentile_approx``, a t-digest that
    merges map-side) is the scale path — both are exposed, the exact one
    is the oracle-checked ground truth.
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50_value"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


def correlation_stats(lineitem: DataFrame) -> DataFrame:
    """Pearson correlation / sample covariance / sample stddev of
    quantity vs extended price per return flag.  All three are single-pass
    streaming aggregates (sum of cross-moments) with map-side partials —
    the shuffle carries 6 doubles per (partition × group)."""
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("stddev_price"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


def important_parts_by_value(lineitem: DataFrame, fraction: float = 1.2) -> DataFrame:
    """TPC-H Q11-style: parts whose revenue exceeds ``fraction`` × the
    mean per-part revenue (the fixture has no partsupp, so lineitem
    revenue stands in for stock value; mean-relative rather than
    total-relative so the threshold is scale-free — same operator
    shape: group-agg filtered by a global scalar aggregate).  The
    per-part aggregate is computed once; the global threshold is a
    1-row aggregate over it, broadcast into the filter — no second
    scan of the fact table.  Per-part sums snap through decimal(18,4)
    before the threshold compare so the boundary is deterministic
    across engines."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Sum in DECIMAL, not double: decimal addition is exact and
    # order-independent, so the per-part totals (and the threshold
    # derived from their exact grand total) are bit-identical across
    # engines and partition orders.  A double sum rounds differently
    # depending on partial-sum order — at sf0.1 two parts landed on a
    # round-half boundary and flipped the last cent vs the oracle.
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(revenue.cast("decimal(18,4)")).alias("pv_dec")
    )
    threshold = per_part.agg(
        (
            F.sum("pv_dec").cast("double")
            / F.count("*")
            * F.lit(fraction)
        ).alias("threshold")
    )
    pv = F.col("pv_dec").cast("double")
    # Round the DECIMAL, then cast: an exact .xx5 half cast to double
    # first rounds differently per engine (Spark rounds the shortest
    # decimal repr, DuckDB the binary value); decimal round is
    # half-away-from-zero in both.
    return (
        per_part.join(F.broadcast(threshold), pv > F.col("threshold"))
        .select(
            "l_partkey",
            F.round(F.col("pv_dec"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


def approx_percentile_value_by_type(events: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """Sketch twin of ``percentile_value_by_type``: ``percentile_approx``
    builds a mergeable quantile sketch per partition (map-side partials)
    — the scale path for percentiles at 100 TB, where the exact operator
    must sort each group.  No SQL oracle by design (approximate); the
    exact twin is oracle-checked and the two are bounded-error-compared
    in tests."""
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)), 4).alias("p50_value"),
            F.round(F.percentile_approx("value", F.lit(0.9), F.lit(accuracy)), 4).alias("p90_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


def price_histogram(orders: DataFrame, bin_width: float = 25_000.0) -> DataFrame:
    """Fixed-width histogram of order totals — the width_bucket shape:
    bucket id is a row-local floor division, so the histogram is one
    partial-aggregated groupBy regardless of bucket count (never a
    sort, never a pass per bucket)."""
    bucket = F.floor(F.col("o_totalprice") / bin_width).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .withColumn("bucket_low", (F.col("bucket") * bin_width).cast("double"))
        .select("bucket", "bucket_low", "n_orders", "min_price", "max_price")
        .orderBy("bucket")
    )


def equidepth_histogram(orders: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram of order totals — the
    complement of ``price_histogram``'s fixed-width form: every bucket
    holds ~count/n rows, so the histogram resolves the dense region of
    a skewed distribution instead of burying it in one fat bin.

    Scale shape: ONE exact percentile aggregate produces the n-1
    cutpoints (a single tiny row broadcast back over the scan), then
    bucket assignment is a row-local fold over the cutpoint array and
    the histogram itself one partial-aggregated groupBy — never a
    global sort, never ntile over the raw facts (an ntile window would
    funnel the whole table through one partition).  At 100 TB the
    exact percentile becomes ``percentile_approx`` (mergeable sketch,
    same plan shape); the exact form is kept here because the oracle
    pins it bit-for-bit."""
    price = F.col("o_totalprice").cast("double")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = orders.agg(
        F.percentile(price, F.array(*[F.lit(q) for q in qs])).alias("cuts")
    )
    bucket = F.aggregate(
        F.col("cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(price > c, 1).otherwise(0),
    )
    return (
        orders.crossJoin(F.broadcast(cuts))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("bucket")
    )


def trimmed_price_means(orders: DataFrame, trim_pct: int = 5) -> DataFrame:
    """Robust per-status price means: two-sided RANK-trimmed mean (drop
    the lowest/highest k = ⌊n·pct/100⌋ rows) and winsorized mean (clamp
    them to the surviving boundary values) — the outlier-robust KPI pair.

    Trimming by RANK, not by value percentile, on purpose: rank
    boundaries are exact integers, so row selection is bit-deterministic
    cross-engine, where interpolated value cutpoints can wobble by one
    ulp and flip a boundary row in and out (cutoffs at a data value are
    the common case at round percentiles).  Ranks come from
    ``scale.distributed_rank`` (statuses are few — the mega-group
    single-task sort this avoids is exactly the skew case), sums stay
    exact decimal, doubles appear once at the output division."""
    from parcial_bigdata_spark.operators.scale import distributed_rank

    v = F.col("o_totalprice").cast("decimal(18,2)")
    ranked = distributed_rank(
        orders.select("o_orderstatus", "o_orderkey", "o_totalprice"),
        "o_totalprice",
        "o_orderkey",
        part_cols=["o_orderstatus"],
        out_col="rk",
    ).select("o_orderstatus", v.alias("v"), "rk")
    counts = ranked.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    k = F.floor(F.col("n") * trim_pct / 100).cast("long")
    tagged = ranked.join(F.broadcast(counts), "o_orderstatus").select(
        "o_orderstatus",
        "v",
        "rk",
        "n",
        k.alias("k"),
    )
    inside = (F.col("rk") > F.col("k")) & (F.col("rk") <= F.col("n") - F.col("k"))
    lo = F.max(F.when(F.col("rk") == F.col("k") + 1, F.col("v")))
    hi = F.max(F.when(F.col("rk") == F.col("n") - F.col("k"), F.col("v")))
    return (
        tagged.groupBy("o_orderstatus")
        .agg(
            F.max("n").alias("n_orders"),
            F.max("k").alias("n_trimmed_each_side"),
            F.sum(F.when(inside, F.col("v"))).alias("s_in"),
            lo.alias("lo"),
            hi.alias("hi"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            "n_trimmed_each_side",
            F.round(
                (F.col("s_in") / (F.col("n_orders") - 2 * F.col("n_trimmed_each_side")))
                .cast("double"),
                4,
            ).alias("trimmed_mean"),
            F.round(
                (
                    (
                        F.col("s_in")
                        + F.col("n_trimmed_each_side") * F.col("lo")
                        + F.col("n_trimmed_each_side") * F.col("hi")
                    )
                    / F.col("n_orders")
                ).cast("double"),
                4,
            ).alias("winsorized_mean"),
            F.col("lo").cast("double").alias("lo_clamp"),
            F.col("hi").cast("double").alias("hi_clamp"),
        )
        .orderBy("o_orderstatus")
    )


def price_boxplot(orders: DataFrame) -> DataFrame:
    """Per-status boxplot profile of order totals: exact quartiles,
    IQR, and Tukey-fence outlier counts (beyond q1−1.5·IQR /
    q3+1.5·IQR) — the five-number summary every data-quality dashboard
    draws.

    Two scans, no window over raw facts: the exact-percentile groupBy
    yields one tiny row per status, which broadcasts back over the scan
    for the fence counts.  Fence arithmetic runs on the identical
    doubles both engines interpolate, so the oracle pins the outlier
    counts exactly (percentile_value_by_type precedent)."""
    price = F.col("o_totalprice").cast("double")
    pct = orders.groupBy("o_orderstatus").agg(
        F.percentile(price, F.lit(0.25)).alias("q1"),
        F.percentile(price, F.lit(0.5)).alias("median"),
        F.percentile(price, F.lit(0.75)).alias("q3"),
    )
    lo_fence = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi_fence = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        orders.join(F.broadcast(pct), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("q1"), 4).alias("q1"),
            F.round(F.min("median"), 4).alias("median"),
            F.round(F.min("q3"), 4).alias("q3"),
            F.round(F.min(F.col("q3") - F.col("q1")), 4).alias("iqr"),
            F.sum(F.when(price < lo_fence, 1).otherwise(0)).alias(
                "n_low_outliers"
            ),
            F.sum(F.when(price > hi_fence, 1).otherwise(0)).alias(
                "n_high_outliers"
            ),
        )
        .orderBy("o_orderstatus")
    )


def revenue_share_by_priority(orders: DataFrame) -> DataFrame:
    """Ratio-to-report: each priority's share of total revenue via a
    window sum over the AGGREGATED frame (|priorities| rows — the
    unpartitioned window runs after reduction, never over raw facts)."""
    per = orders.groupBy("o_orderpriority").agg(
        money_sum("o_totalprice").alias("revenue")
    )
    w = Window.partitionBy()
    return per.select(
        "o_orderpriority",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share"),
    ).orderBy("o_orderpriority")


def approx_distinct_parts_checked(
    lineitem: DataFrame, rsd: float = 0.01, pct_tol: float = 0.02
) -> DataFrame:
    """Oracle-checkable audit form of ``approx_distinct_parts``: runs the
    HLL++ distinct sketch and the t-digest percentile sketch SIDE BY SIDE
    with their exact counterparts in one aggregate pass, and emits the
    exact values (ANSI-SQL-reproducible) plus deterministic error-bound
    flags (``approx BETWEEN lo AND hi`` rendered as INT, per the round-4
    verdict) — so the registry row hash-greens instead of recording a
    rows-only ``err:no_oracle``.

    Bounds: HLL++ with relative standard deviation ``rsd`` is asserted
    within 5·rsd of exact (5 sigma); ``approx_percentile`` within
    ``pct_tol`` of the value RANGE (its rank error is ≤ n/accuracy —
    far inside that on any non-degenerate distribution).  The raw
    sketch-only operator remains the production path at 100 TB, where
    the exact twin columns would cost a sort/expand this audit pays on
    purpose."""
    pcts = F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99))")
    epcts = F.expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))")
    agg = lineitem.agg(
        F.countDistinct("l_partkey").alias("n_exact_parts"),
        F.approx_count_distinct("l_partkey", rsd).alias("_approx"),
        pcts.alias("_ap"),
        epcts.alias("_ep"),
        F.min("l_extendedprice").alias("_mn"),
        F.max("l_extendedprice").alias("_mx"),
    )
    tol = (F.col("_mx") - F.col("_mn")) * pct_tol

    def _pct_ok(i):
        return (
            F.abs(F.col("_ap")[i] - F.col("_ep")[i]) <= tol
        ).cast("int")

    return agg.select(
        "n_exact_parts",
        F.round(F.col("_ep")[0], 4).alias("p50"),
        F.round(F.col("_ep")[1], 4).alias("p95"),
        F.round(F.col("_ep")[2], 4).alias("p99"),
        (
            F.abs(F.col("_approx") - F.col("n_exact_parts"))
            <= F.lit(5 * rsd) * F.col("n_exact_parts")
        )
        .cast("int")
        .alias("approx_distinct_ok"),
        _pct_ok(0).alias("p50_ok"),
        _pct_ok(1).alias("p95_ok"),
        _pct_ok(2).alias("p99_ok"),
    )


def approx_percentile_value_by_type_checked(
    events: DataFrame, accuracy: int = 10_000, pct_tol: float = 0.02
) -> DataFrame:
    """Oracle-checkable audit form of ``approx_percentile_value_by_type``:
    per event type, the exact interpolated percentiles (= DuckDB
    ``quantile_cont``, the oracle) alongside bound flags asserting the
    quantile sketch lands within ``pct_tol`` of each group's value range
    (rank error ≤ n/accuracy ⟹ far tighter in practice).  Same purpose
    as ``approx_distinct_parts_checked`` — no rows-only driver record for
    a by-design approximate aggregate."""
    grouped = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50_value"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90_value"),
        F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)).alias("_a50"),
        F.percentile_approx("value", F.lit(0.9), F.lit(accuracy)).alias("_a90"),
        F.min("value").alias("_mn"),
        F.max("value").alias("_mx"),
        F.count("*").alias("n_events"),
    )
    tol = (F.col("_mx") - F.col("_mn")) * pct_tol
    return grouped.select(
        "event_type",
        "p50_value",
        "p90_value",
        "n_events",
        (F.abs(F.col("_a50") - F.col("p50_value")) <= tol).cast("int").alias("p50_ok"),
        (F.abs(F.col("_a90") - F.col("p90_value")) <= tol).cast("int").alias("p90_ok"),
    ).orderBy("event_type")


def supplier_return_report(lineitem: DataFrame) -> DataFrame:
    """Per-supplier quality report: returned-line share (l_returnflag =
    'R') and the exact-decimal value of returned merchandise — the
    operational diagnostic behind TPC-H Q10's blame query, exposed as a
    standalone scan-and-aggregate per supplier.

    One map-side-combining groupBy on l_suppkey; the return share
    rounds through ``ratio_round`` (quotients of small exact ints land
    on decimal halves) and the returned value through ``money_sum``."""
    from parcial_bigdata_spark.functions.money import ratio_round

    returned = F.col("l_returnflag") == "R"
    return (
        lineitem.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(returned.cast("long")).alias("n_returned"),
            ratio_round(
                F.sum(returned.cast("long")) / F.count(F.lit(1)), 6
            ).alias("return_share"),
            money_sum(
                F.when(returned, F.col("l_extendedprice")).otherwise(F.lit(0.0))
            ).alias("returned_value"),
        )
        .orderBy("l_suppkey")
    )


def monthly_revenue_yoy(orders: DataFrame) -> DataFrame:
    """Monthly revenue with month-over-month and year-over-year deltas —
    the seasonality report.  Revenue sums via ``money_sum`` (exact
    decimal, order-independent); the lag windows run over the
    |months|-row aggregated frame (tiny by construction), never the
    fact scan, and the deltas of exact 2-decimal doubles need no
    further rounding."""
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice").alias("revenue"),
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "n_orders",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue", 1).over(w), 2).alias(
            "mom_delta"
        ),
        F.round(F.col("revenue") - F.lag("revenue", 12).over(w), 2).alias(
            "yoy_delta"
        ),
    ).orderBy("month")


def hourly_ohlc(events: DataFrame) -> DataFrame:
    """Per-(event_type, hour) OHLC bars (`events_hourly_ohlc`) — the
    time-bucket downsample every monitoring / market stack runs (the
    TimescaleDB ``time_bucket`` + first/last shape): open and close are
    the values at the bucket's (ts, event_id) bookends, high/low the
    extrema, volume the exact-decimal value sum.

    One map-side-combining groupBy — open/close are struct argmin /
    argmax over the (ts, event_id, value) total order, NEVER a window
    over the raw stream (a bucket-partitioned window would re-shuffle
    the same key and serialize hot buckets).  High/low return input
    doubles unchanged; volume sums on the cents grid
    (decimal(18,2), the engine-wide money convention) so the total is
    order-insensitive and engine-exact."""
    hour = F.date_trunc("hour", F.col("ts"))
    bookend = F.struct(
        F.col("ts"), F.col("event_id").alias("eid"), F.col("value").alias("v")
    )
    return (
        events.select(
            "event_type",
            hour.alias("hour"),
            "value",
            F.col("value").cast("decimal(18,2)").alias("__v2"),
            bookend.alias("__bk"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__bk").getField("v").alias("open"),
            F.max("__bk").getField("v").alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            # exact-decimal sum; double only at the output edge
            F.sum("__v2").cast("double").alias("volume"),
        )
        .orderBy("event_type", "hour")
    )


def abc_revenue_classes(lineitem: DataFrame) -> DataFrame:
    """ABC / Pareto classification of parts by revenue contribution
    (`parts_abc_classes`): rank parts by revenue, classify the heads
    that carry ≤80% of cumulative revenue as A, ≤95% as B, the tail as
    C — the inventory-analysis classic.

    Exactness: revenue moves to the INTEGER 1e-4 grid immediately
    (price×(1−disc) is exact at scale 4; ×10⁴ → long), so cumulative
    sums and the 80/95 cut-offs are pure integer arithmetic —
    cum·5 ≤ tot·4 and cum·20 ≤ tot·19 — never a float share.  The
    per-part units and both window sums ride decimal(38,0) (round-11
    advice: an int64 cumulative sum wraps silently past ~4.6e17 total
    units ≈ TPC-H sf200 while the DuckDB oracle promotes to HUGEINT);
    only the per-lineitem map-side sum stays long, whose wrap bound is
    PER-PART revenue > 9.2e14 currency units — unreachable.  Ordering
    ties break on part key.

    Scale: revenue aggregates per part FIRST (map-side combining on
    the part key), so the unkeyed cumulative window runs over the
    |parts|-row dimension-sized aggregate — the documented
    post-aggregation unkeyed-window pattern — never over line items."""
    rev_units = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        * 10000
    ).cast("long")
    parts = lineitem.groupBy("l_partkey").agg(
        F.sum(rev_units).cast("decimal(38,0)").alias("units")
    )
    w = Window.orderBy(F.col("units").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.orderBy(F.col("units").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum, tot = F.sum("units").over(w), F.sum("units").over(wt)
    cls = (
        F.when(cum * 5 <= tot * 4, "A")
        .when(cum * 20 <= tot * 19, "B")
        .otherwise("C")
    )
    return (
        parts.select("l_partkey", "units", cls.alias("abc_class"))
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum("units").cast("double") / F.lit(10000.0)).alias(
                "class_revenue"
            ),
        )
        .orderBy("abc_class")
    )


def nation_supplier_hhi(lineitem: DataFrame, supplier: DataFrame,
                        nation: DataFrame) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation
    (`nation_supplier_hhi`): HHI = Σ share_i² of each supplier's
    revenue share within its nation — the market-concentration /
    single-source-risk readout (1/HHI is the effective supplier
    count).

    Exact: revenue rides the integer 1e-4 grid per supplier; the HHI
    numerator Σ rev_i² and denominator (Σ rev_i)² are exact decimals,
    and the reported double is ONE division of the two exact values —
    the identical op sequence on both engines.  Suppliers aggregate
    map-side on the supplier key; the |nations|-level rollup touches
    |suppliers| rows; the dimension tables broadcast."""
    rev_units = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        * 10000
    ).cast("long")
    per_supp = (
        lineitem.select("l_suppkey", rev_units.alias("u"))
        .groupBy("l_suppkey")
        .agg(F.sum("u").cast("decimal(38,0)").alias("rev"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        per_supp.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("rev") * F.col("rev")).alias("__num"),
            F.sum("rev").alias("__tot"),
        )
        .select(
            "n_name",
            "n_suppliers",
            (
                F.col("__num").cast("double")
                / (F.col("__tot").cast("double") * F.col("__tot").cast("double"))
            ).alias("hhi"),
        )
        .orderBy("n_name")
    )


def price_elasticity_by_brand(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """Log-log OLS price-elasticity estimate per brand
    (`parts_price_elasticity`): regress ln(quantity) on ln(retail
    price) across each brand's line items — slope = elasticity, the
    pricing-analytics staple (a slope near −1 means unit-elastic
    demand; TPC-H's generator draws quantity independent of price, so
    the expected slope is ≈ 0 with a diagnosable r²).

    One fact-side projection computes both logs row-locally; ONE
    map-side-combining brand aggregate collects the five regression
    moments (n, Σx, Σy, Σxy, Σx²) plus Σy² for r².  Like the sibling
    zipf fit, the double moment sums are group-aggregated and the
    slope/intercept/r² are rounded at the output edge (4 dp) — the
    moments are O(1e5)-magnitude doubles whose summation-order jitter
    is ~1e-11 relative, invisible at 4 dp.

    Scale: the part join is keyed on p_partkey (broadcast when small,
    shuffle otherwise — Catalyst's call); everything after the join is
    a single aggregate to the |brands| grain."""
    j = lineitem.select("l_partkey", "l_quantity").join(
        part.select("p_partkey", "p_brand", "p_retailprice"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    x = F.log(F.col("p_retailprice"))
    y = F.log(F.col("l_quantity"))
    per = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cov / varx
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = cov * cov / (varx * vary)
    return per.select(
        "p_brand",
        F.col("n").cast("long").alias("n_lines"),
        F.round(slope, 4).alias("elasticity"),
        F.round(intercept, 4).alias("intercept"),
        F.round(r2, 4).alias("r2"),
    ).orderBy("p_brand")
