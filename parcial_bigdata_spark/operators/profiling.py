"""Data profiling utilities — the ANALYZE-style introspection a user
points at a new table before writing queries, and the key-distribution
diagnostic that finds skew (salting/AQE-split candidates) before a big
join burns a cluster on one hot partition.

Both are single-scan linear aggregates; neither collects anything to
the driver.

Beyond-reference capability (SURVEY.md §2.11 — the reference has no
introspection surface; its one table is unindexed MySQL,
``lambda/subirDB.py:72-77``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column null and distinct counts in ONE pass over the table.

    All 2·|cols| aggregates run in a single HashAggregate (one scan, one
    1-row result), then unpivot row-locally via ``stack`` — profiling a
    100 TB table costs exactly one scan, not |cols| scans.  Exact
    distinct counts (oracle-comparable); swap in approx_count_distinct
    for the sketch path on truly wide tables."""
    cols = columns if columns is not None else df.columns
    if not cols:
        # an explicitly-empty list must not silently widen to a full
        # 2×|all-cols| scan of a possibly-huge table
        raise ValueError("profile_table: empty column list")
    # Internal aliases are INDEXED (__n_0, __d_0, …), never derived from
    # the column name: a name with a quote/space/dash would otherwise
    # produce an invalid alias or a collision.  The user-visible name
    # appears only as an escaped string literal in the stack() expr.
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{i}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__d_{i}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __n_{}, __d_{}".format(c.replace("\\", "\\\\").replace("'", "\\'"), i, i)
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)"
        )
    ).orderBy("col_name")


ORDERS_EXPECTATIONS: list[tuple[str, str]] = [
    # (rule_id, SQL boolean over an orders row — TRUE means the row
    # PASSES; NULL input means the rule that mentions it fails, which
    # the explicit IS-NOT-NULL terms make unambiguous)
    ("totalprice_positive", "o_totalprice IS NOT NULL AND o_totalprice > 0"),
    (
        "orderdate_in_range",
        "o_orderdate IS NOT NULL AND o_orderdate >= DATE '1992-01-01' "
        "AND o_orderdate < DATE '1999-01-01'",
    ),
    ("status_in_domain", "o_orderstatus IN ('O', 'F', 'P')"),
    ("custkey_present", "o_custkey IS NOT NULL"),
    ("priority_prefixed", "o_orderpriority LIKE '_-%'"),
]


def validate_expectations(
    df: DataFrame, rules: list[tuple[str, str]] | None = None
) -> DataFrame:
    """Data-contract gate (the Great-Expectations / dbt-test shape): a
    declarative rule set evaluated in ONE single-scan stacked aggregate
    — per rule, row counts, violation counts, and a pass flag.  The
    checks a pipeline runs on every landed batch before promoting it.

    Every rule is a row-level boolean SQL expression compiled into a
    conditional count, so adding a rule never adds a scan and the plan
    stays a single map-side-combining aggregate (the ``profile_table``
    shape).  NULL handling is explicit per rule — a NULL predicate
    input counts as a violation only when the rule says so, which keeps
    the semantics engine-portable.  Default rule set: the orders
    contract (``ORDERS_EXPECTATIONS``)."""
    rules = list(ORDERS_EXPECTATIONS if rules is None else rules)
    if not rules:
        raise ValueError("validate_expectations: empty rule set")
    total = F.count(F.lit(1))
    aggs = []
    for rule_id, predicate in rules:
        ok = F.expr(predicate)
        aggs.append(
            F.sum(
                F.when(~F.coalesce(ok, F.lit(False)), 1).otherwise(0)
            ).alias(f"__viol_{rule_id}")
        )
    wide = df.agg(total.alias("__n"), *aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(rule_id).alias("rule_id"),
                    F.lit(predicate).alias("rule"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__viol_{rule_id}").alias("n_violations"),
                )
                for rule_id, predicate in rules
            ]
        )
    ).alias("r")
    return (
        wide.select(rows)
        .select(
            "r.rule_id",
            "r.rule",
            "r.n_rows",
            "r.n_violations",
            (F.col("r.n_violations") == 0).alias("passed"),
        )
        .orderBy("rule_id")
    )


def skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Top-N hottest keys with their share of the table and skew ratio
    vs the mean key frequency — the pre-join diagnostic that decides
    between plain shuffle, AQE skew-split, and explicit salting
    (operators/scale.py:salted_join).

    One groupBy on the key (map-side partial counts), a broadcast 1-row
    total, and a TakeOrdered for the top-N — no sort of the full key
    space."""
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count("*").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"), F.count("*").alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key_value",
            "n_rows",
            F.round(F.col("n_rows") / F.col("total_rows"), 6).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("total_rows") / F.col("n_keys")), 4
            ).alias("skew_ratio"),
        )
        # asc_nulls_last pins the NULL-key group's tiebreak position to
        # DuckDB's default (ASC → NULLS LAST); Spark's default NULLS
        # FIRST would diverge from the oracle whenever a null key lands
        # on the top-N cut or ties with a non-null key.
        .orderBy(F.col("n_rows").desc(), F.col("key_value").asc_nulls_last())
        .limit(top_n)
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare: list[str] | None = None
) -> DataFrame:
    """CDC-style audit between two snapshots of a table: per-key rows
    classified added / removed / changed / unchanged, returned as
    category counts (the pipeline-run health check before promoting a
    new snapshot).

    One full-outer join on the key; change detection hashes the
    compared columns on EACH SIDE BEFORE the join, so only (key, hash)
    pairs shuffle — the payload columns never leave their scan.  Each
    column is null-tagged before hashing: Spark's xxhash64 SKIPS null
    inputs (hash(null, x) == hash(x, null)), so raw multi-column hashes
    would silently equate cross-column null swaps."""
    cols = compare or [c for c in old.columns if c != key]
    if set(cols) - set(new.columns):
        raise ValueError(f"compare columns missing from new snapshot: "
                         f"{sorted(set(cols) - set(new.columns))}")

    def keyed(df: DataFrame, side: str) -> DataFrame:
        tagged = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00"))
            for c in cols
        ]
        return df.select(
            F.col(key).alias(f"{side}_key"),
            F.xxhash64(*tagged).alias(f"{side}_hash"),
            # side-presence flag: change_type must key off which SIDE
            # produced the row, not key nullness — a NULL-key row is a
            # real row, and testing o_key.isNull() would misreport it
            # as added/removed inversely
            F.lit(True).alias(f"{side}_present"),
        )

    # Plain equality: NULL keys never match (a row's identity across
    # snapshots is unknowable without a key), so a null-key row counts
    # as removed from old and/or added to new — totals always reconcile
    # with both snapshots' row counts.  A null-safe match would instead
    # cross-join M×N null-key rows and inflate the counts.
    joined = keyed(old, "o").join(
        keyed(new, "n"), F.col("o_key") == F.col("n_key"), "full_outer"
    )
    change = (
        F.when(F.col("o_present").isNull(), F.lit("added"))
        .when(F.col("n_present").isNull(), F.lit("removed"))
        .when(F.col("o_hash") != F.col("n_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("change_type")
    )


def orphan_audit(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    child_name: str | None = None,
) -> DataFrame:
    """Referential-integrity audit for one FK edge: how many child rows
    reference a parent key that does not exist (orphans), how many
    distinct orphan keys, plus the total/null accounting a data-quality
    gate needs before promoting a snapshot.

    One left-anti-shaped aggregate: the child's key-distinct frame
    (usually tiny relative to the fact table after the map-side
    combine) left-joins the parent's key set; orphan rows then weight
    back by their reference counts — so the parent join never sees the
    fact-table row volume, only distinct keys.  NULL FKs are counted
    separately (a null reference is a modeling decision, not an orphan)."""
    name = child_name or "child"
    refs = child.groupBy(F.col(fk).alias("k")).agg(
        F.count(F.lit(1)).alias("n_refs")
    )
    keys = parent.select(F.col(pk).alias("k")).distinct().withColumn(
        "present", F.lit(True)
    )
    joined = refs.join(keys, "k", "left")
    return joined.agg(
        F.lit(name).alias("child_table"),
        F.lit(fk).alias("fk_column"),
        F.sum("n_refs").alias("n_child_rows"),
        F.sum(F.when(F.col("k").isNull(), F.col("n_refs")).otherwise(0)).alias(
            "n_null_fk"
        ),
        F.sum(
            F.when(
                F.col("present").isNull() & F.col("k").isNotNull(),
                F.col("n_refs"),
            ).otherwise(0)
        ).alias("n_orphan_rows"),
        F.sum(
            F.when(
                F.col("present").isNull() & F.col("k").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_orphan_keys"),
    )


def integrity_audit(tables: dict[str, DataFrame], edges: list[tuple[str, str, str, str]]) -> DataFrame:
    """Whole-schema referential-integrity report: one ``orphan_audit``
    row per declared FK edge (child_table, fk, parent_table, pk),
    unioned.  Each edge is an independent distinct-key join — the plan
    fans out in parallel, and no edge ever shuffles fact-table
    payloads.  The TPC-H edge list is the registry's test harness; a
    real deployment passes its own catalog."""
    parts = [
        orphan_audit(tables[c], tables[p], fk, pk, child_name=c)
        for c, fk, p, pk in edges
    ]
    out = parts[0]
    for frame in parts[1:]:
        out = out.unionByName(frame)
    return out.orderBy("child_table", "fk_column")


# Declared functional dependencies to audit on lineitem: the composite
# PK must hold; the two single-column candidates are EXPECTED to fail
# (TPC-H parts ship from many suppliers, orders mix return flags) —
# the audit's value is the measured branching, not a green wall.
LINEITEM_FDS: list[tuple[str, tuple[str, ...], tuple[str, ...]]] = [
    (
        "pk_order_line",
        ("l_orderkey", "l_linenumber"),
        ("l_partkey", "l_suppkey", "l_quantity"),
    ),
    ("part_to_supplier", ("l_partkey",), ("l_suppkey",)),
    ("order_to_returnflag", ("l_orderkey",), ("l_returnflag",)),
]


def functional_dependencies(
    df: DataFrame,
    deps: list[tuple[str, tuple[str, ...], tuple[str, ...]]] | None = None,
) -> DataFrame:
    """Functional-dependency / key-uniqueness audit
    (`integrity_functional_deps`): for each declared determinant →
    dependent pair, count determinant values that map to MORE than one
    distinct dependent tuple — the grouping-level data-quality check
    the row-level expectations gate cannot express (a duplicate key is
    invisible to any single-row predicate).

    Per dependency: one map-side-combining groupBy on the determinant
    with a distinct-count of the dependent struct — violations =
    determinants with branching > 1, and max_branching quantifies HOW
    broken a failed dependency is.  Each dependency is one linear
    shuffle on its own key; results union into one report frame."""
    deps = list(LINEITEM_FDS if deps is None else deps)
    if not deps:
        raise ValueError("functional_dependencies: empty dependency list")
    frames = []
    for dep_id, det, dependents in deps:
        missing = (set(det) | set(dependents)) - set(df.columns)
        if missing:
            raise ValueError(
                f"functional_dependencies: {dep_id} references missing "
                f"columns {sorted(missing)}"
            )
        per_key = df.groupBy(*det).agg(
            F.countDistinct(F.struct(*dependents)).alias("__branching")
        )
        frames.append(
            per_key.agg(
                F.lit(dep_id).alias("dep_id"),
                F.lit(" + ".join(det)).alias("determinant"),
                F.lit(" + ".join(dependents)).alias("dependent"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum((F.col("__branching") > 1).cast("long")).alias(
                    "n_violating_keys"
                ),
                F.max("__branching").alias("max_branching"),
                (F.max("__branching") == 1).cast("int").alias("holds"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("dep_id")


# First-significant-digit shares under Benford's law, log10(1 + 1/d).
# Computed ONCE in Python and injected as literals into BOTH engines
# (the Spark plan via F.lit, the DuckDB oracle via repr in the SQL
# string), so the expected shares are the identical doubles everywhere
# — engine log10 implementations are only 1-ulp-accurate, not
# correctly rounded, and must not appear in the comparison path.
import math as _math

BENFORD_SHARES: dict[int, float] = {
    d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_audit(orders: DataFrame, amount_col: str = "o_totalprice") -> DataFrame:
    """First-digit Benford's-law audit of an amount column
    (`integrity_benford_audit`) — the classic fraud / synthetic-data
    screen: organically-grown monetary amounts follow
    P(d) = log10(1+1/d); fabricated or capped amounts don't, and the
    per-digit chi-square contribution points at WHICH digit is off.

    Exact and engine-portable: the first digit comes from the STRING
    of the floored integer part (floor is exact; integer-to-string is
    identical across engines — never floor(log10(x)), whose 1-ulp
    wobble can misbucket exact powers of ten); counts are integers;
    the expected shares are shared Python literals (see
    ``BENFORD_SHARES``); observed share and the chi-square term
    (obs − n·p)²/(n·p) are ONE fixed IEEE op sequence each over exact
    operands, then the shared round-6.  All nine digit rows are always
    present (zero-count digits report their full expected deficit).

    Scale: one map-side-combining 9-group aggregate over the scan; the
    single-row total broadcasts."""
    from parcial_bigdata_spark.functions.money import ratio_round

    amounts = orders.where(F.col(amount_col) >= 1)
    digit = F.substring(
        F.floor(F.col(amount_col)).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = amounts.groupBy(digit.alias("first_digit")).agg(
        F.count(F.lit(1)).alias("n_amounts")
    )
    total = amounts.agg(F.count(F.lit(1)).alias("__n"))
    from parcial_bigdata_spark.operators.scale import lit_lookup

    digits = orders.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("first_digit")
    )
    expected = lit_lookup(BENFORD_SHARES, "first_digit")
    obs = F.coalesce("n_amounts", F.lit(0)).cast("double")
    n = F.col("__n").cast("double")
    dev = obs - n * expected
    return (
        digits.join(counts, "first_digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "first_digit",
            F.coalesce("n_amounts", F.lit(0)).alias("n_amounts"),
            ratio_round(obs / n, 6).alias("observed_share"),
            expected.alias("expected_share"),
            ratio_round(dev * dev / (n * expected), 6).alias("chisq_term"),
        )
        .orderBy("first_digit")
    )


def schema_drift(
    orders: DataFrame, split_date: str = "1998-05-01"
) -> DataFrame:
    """Two-period column-statistics drift report
    (`integrity_schema_drift`): split the table at a date boundary and
    compare per-column health metrics — null rate, mean, min/max for
    numerics; null rate, distinct count, mode share for categoricals —
    the check a data-quality monitor runs when a new snapshot lands to
    catch silent upstream distribution shifts (a column going sparse,
    a new enum value diluting the mode, a price-scale change).

    Exactness: every metric is either an integer count, an exact
    DECIMAL(18,2) min/max/sum, or a ratio of those — each ratio is ONE
    IEEE division rounded through ratio_round(6).  The mode is
    tie-broken lexicographically, so it is a deterministic selection,
    not an arbitrary-first pick.

    Scale: ONE pass over the table computes both periods' numeric
    aggregates (groupBy on the derived period tag, map-side combined),
    then ONE explode(create_map) unpivots the 2-row summary into metric
    rows — the table is never re-scanned per metric.  Each categorical
    column adds one (period, value)-grain count whose output is bounded
    by the enum cardinality; its distinct count and deterministic mode
    are argmax/count aggregates on that tiny frame (no countDistinct
    expand against the fact table).  Census: 5 hash exchanges total —
    1 numeric agg + 2 per categorical column — plus the pivot."""
    from parcial_bigdata_spark.functions.money import ratio_round

    period = F.when(
        F.col("o_orderdate") < F.lit(split_date).cast("timestamp"),
        F.lit("baseline"),
    ).otherwise(F.lit("current"))
    price = F.col("o_totalprice").cast("decimal(18,2)")

    base = orders.select(
        period.alias("period"),
        price.alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    num = base.groupBy("period").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("price").alias("n_price"),
        F.sum("price").alias("sum_price"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
        F.count("status").alias("n_status"),
        F.count("priority").alias("n_priority"),
    )

    def _cat(col: str) -> DataFrame:
        # (period, value) counts: enum-cardinality output, one exchange
        counts = base.filter(F.col(col).isNotNull()).groupBy(
            "period", col
        ).agg(F.count(F.lit(1)).alias("c"))
        # deterministic mode: max (count, reverse-lexicographic value)
        # struct per period — an argmax aggregate on the enum-sized
        # frame; distinct = row count of the same frame (no expand)
        best = counts.groupBy("period").agg(
            F.max(F.struct(F.col("c"), F.col(col))).alias("b"),
            F.sum("c").alias("tot"),
            F.count(F.lit(1)).alias("d"),
        )
        return best.select(
            "period",
            F.explode(
                F.create_map(
                    F.lit(f"{col}_mode_share"),
                    ratio_round(
                        F.col("b.c").cast("double")
                        / F.col("tot").cast("double"),
                        6,
                    ),
                    F.lit(f"{col}_distinct"),
                    F.col("d").cast("double"),
                )
            ).alias("metric", "value"),
        )

    n = F.col("n").cast("double")
    metrics = num.select(
        "period",
        F.explode(
            F.create_map(
                F.lit("price_null_rate"),
                ratio_round((n - F.col("n_price")) / n, 6),
                F.lit("price_mean"),
                ratio_round(
                    F.col("sum_price").cast("double") / F.col("n_price"), 6
                ),
                F.lit("price_min"),
                F.col("min_price").cast("double"),
                F.lit("price_max"),
                F.col("max_price").cast("double"),
                F.lit("status_null_rate"),
                ratio_round((n - F.col("n_status")) / n, 6),
                F.lit("priority_null_rate"),
                ratio_round((n - F.col("n_priority")) / n, 6),
            )
        ).alias("metric", "value"),
    )
    metrics = metrics.unionByName(_cat("status")).unionByName(
        _cat("priority")
    )

    wide = (
        metrics.groupBy("metric")
        .pivot("period", ["baseline", "current"])
        .agg(F.first("value"))
    )
    return wide.select(
        "metric",
        "baseline",
        "current",
        ratio_round(F.col("current") - F.col("baseline"), 6).alias("change"),
    ).orderBy("metric")
