"""Profiling utilities: single-pass column profile and key-skew report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parcial_bigdata_spark.operators import profiling


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.5), (3, None, 1.5), (4, "b", None)],
        "id long, cat string, val double",
    )
    out = {r.col_name: (r.n_nulls, r.n_distinct)
           for r in profiling.profile_table(df).collect()}
    assert out == {"id": (0, 4), "cat": (1, 2), "val": (2, 1)}


def test_profile_respects_column_subset(spark):
    df = spark.createDataFrame([(1, "a")], "id long, cat string")
    out = profiling.profile_table(df, columns=["cat"]).collect()
    assert [r.col_name for r in out] == ["cat"]


def test_profile_is_single_scan(spark):
    """All per-column aggregates must land in ONE aggregate over one
    scan — no per-column jobs."""
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.5)], "id long, cat string, val double"
    )
    plan = profiling.profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1


def test_skew_profile_flags_hot_key(spark):
    rows = [(1,)] * 8 + [(2,)] * 1 + [(3,)] * 1
    df = spark.createDataFrame(rows, "k long")
    out = profiling.skew_profile(df, "k", top_n=2).collect()
    assert [r.key_value for r in out] == [1, 2]
    hot = out[0]
    # key 1 holds 8/10 rows; mean frequency is 10/3 ≈ 3.33 → skew 2.4
    assert hot.n_rows == 8 and abs(hot.share - 0.8) < 1e-9
    assert abs(hot.skew_ratio - 2.4) < 1e-9
    # ties at the cut broken by key order
    assert out[1].n_rows == 1


def test_snapshot_diff_classifies_all_cases(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (3, "c", None), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    out = {r.change_type: r.n_rows
           for r in profiling.snapshot_diff(old, new, "k").collect()}
    # 1 unchanged, 2 changed (case), 3 unchanged (null == null), 4 removed, 5 added
    assert out == {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}


def test_snapshot_diff_null_vs_sentinel_not_conflated(spark):
    """A real null must not hash-collide with an adjacent column's null
    (xxhash64 skips nulls; the null tagging restores positional info)."""
    old = spark.createDataFrame([(1, None, "x")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "x", None)], "k long, a string, b string")
    out = {r.change_type: r.n_rows
           for r in profiling.snapshot_diff(old, new, "k").collect()}
    assert out == {"changed": 1}


def test_snapshot_diff_rejects_missing_compare_columns(spark):
    import pytest

    old = spark.createDataFrame([(1, "a")], "k long, s string")
    new = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        profiling.snapshot_diff(old, new, "k")


def test_profile_handles_hostile_column_names(spark):
    """Column names with spaces, dashes, and quotes must survive the
    stack() unpivot (indexed internal aliases + escaped literals)."""
    df = spark.createDataFrame(
        [(1, "x"), (2, None)], ["weird name-col", "it's quoted"]
    )
    out = {r.col_name: (r.n_nulls, r.n_distinct)
           for r in profiling.profile_table(df).collect()}
    assert out == {"weird name-col": (0, 2), "it's quoted": (1, 1)}


def test_skew_profile_null_key_sorts_last(spark):
    """A NULL key tying with a non-null key must sort AFTER it (DuckDB
    ASC default = NULLS LAST), so the top-N cut matches the oracle."""
    rows = [(1,)] * 3 + [(None,)] * 3 + [(2,)] * 3 + [(3,)] * 1
    df = spark.createDataFrame(rows, "k int")
    out = profiling.skew_profile(df, "k", top_n=3).collect()
    assert [r.key_value for r in out] == [1, 2, None]


def test_snapshot_diff_null_keys_classified_correctly(spark):
    """NULL-key rows are real rows whose identity across snapshots is
    unknowable: one present only in OLD is 'removed' (not 'added', the
    round-5 review's reproduced misclassification), and with null-key
    rows on both sides each is reported independently (removed+added) —
    never cross-matched M×N — so totals reconcile with both snapshots'
    row counts."""
    old = spark.createDataFrame(
        [(None, "a"), (1, "b"), (None, "x")],
        "k int, v string",
    ).where(F.col("v") != "x")  # one NULL-key row in old
    new = spark.createDataFrame([(1, "b")], "k int, v string")
    got = {r.change_type: r.n_rows
           for r in profiling.snapshot_diff(old, new, key="k").collect()}
    assert got == {"removed": 1, "unchanged": 1}

    # two null-key rows in old, one in new: no cross-matching — counts
    # reconcile (2 removed + 1 added + 1 unchanged = 3 old rows, 2 new)
    old2 = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c")], "k int, v string"
    )
    new2 = spark.createDataFrame([(None, "a"), (1, "c")], "k int, v string")
    got2 = {r.change_type: r.n_rows
            for r in profiling.snapshot_diff(old2, new2, key="k").collect()}
    assert got2 == {"removed": 2, "added": 1, "unchanged": 1}


def test_profile_table_rejects_empty_column_list(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="empty column list"):
        profiling.profile_table(df, columns=[])


def test_orphan_audit_counts_orphans_and_nulls(spark):
    """Orphans, null FKs, and clean references classified separately;
    orphan keys counted distinct while orphan rows count references."""
    from parcial_bigdata_spark.operators.profiling import orphan_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, 99), (5, 98), (6, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = orphan_audit(child, parent, "fk", "pk", child_name="t").collect()[0]
    assert row.child_table == "t" and row.fk_column == "fk"
    assert row.n_child_rows == 6
    assert row.n_null_fk == 1
    assert row.n_orphan_rows == 3      # two 99s + one 98
    assert row.n_orphan_keys == 2      # {99, 98}


def test_integrity_audit_one_row_per_edge(spark):
    from parcial_bigdata_spark.operators.profiling import integrity_audit

    a = spark.createDataFrame([(1, 5)], "id long, fk long")
    b = spark.createDataFrame([(5,), (6,)], "pk long")
    out = integrity_audit(
        {"a": a, "b": b},
        [("a", "fk", "b", "pk"), ("b", "pk", "a", "id")],
    ).collect()
    assert [(r.child_table, r.fk_column) for r in out] == [
        ("a", "fk"), ("b", "pk")
    ]
    assert out[0].n_orphan_rows == 0
    assert out[1].n_orphan_rows == 2   # pks 5,6 vs ids {1}


def test_validate_expectations_counts_and_null_rule(spark):
    """Each rule's violation count is exact; a NULL predicate input is
    a violation (NOT coalesce(pred, FALSE)); the whole gate is ONE scan
    (a single stacked aggregate — no per-rule exchange)."""
    import datetime as dt
    import re

    from parcial_bigdata_spark.operators.profiling import (
        validate_expectations,
    )

    rows = [
        (1, 1, "O", 100.0, dt.date(1995, 1, 1), "1-URGENT"),
        (2, 2, "X", -5.0, dt.date(2005, 1, 1), "oops"),     # 4 violations
        (3, None, "F", None, None, "2-HIGH"),               # nulls violate
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    out = validate_expectations(orders)
    got = {r.rule_id: (r.n_rows, r.n_violations, r.passed) for r in out.collect()}
    assert got == {
        "totalprice_positive": (3, 2, False),
        "orderdate_in_range": (3, 2, False),
        "status_in_domain": (3, 1, False),
        "custkey_present": (3, 1, False),
        "priority_prefixed": (3, 1, False),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0
    import pytest

    with pytest.raises(ValueError):
        validate_expectations(orders, rules=[])


def test_functional_dependencies_holds_and_branching(spark):
    from parcial_bigdata_spark.operators.profiling import (
        functional_dependencies,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 10), (2, "b", 20), (2, "c", 20), (3, "d", 30)],
        "k long, dep1 string, dep2 long",
    )
    deps = [
        ("k_to_dep1", ("k",), ("dep1",)),   # k=2 maps to {b, c}: violated
        ("k_to_dep2", ("k",), ("dep2",)),   # holds (duplicates collapse)
    ]
    out = {r.dep_id: r for r in functional_dependencies(df, deps).collect()}
    v = out["k_to_dep1"]
    assert (v.n_keys, v.n_violating_keys, v.max_branching, v.holds) == (3, 1, 2, 0)
    h = out["k_to_dep2"]
    assert (h.n_keys, h.n_violating_keys, h.max_branching, h.holds) == (3, 0, 1, 1)


def test_functional_dependencies_rejects_missing_columns(spark):
    import pytest

    from parcial_bigdata_spark.operators.profiling import (
        functional_dependencies,
    )

    with pytest.raises(ValueError, match="missing"):
        functional_dependencies(
            spark.range(1), [("bad", ("nope",), ("id",))]
        )


def test_schema_drift_null_categoricals_match_oracle(spark, tmp_path):
    """Round-13 advice (medium): the Spark side excludes NULLs from the
    categorical mode numerator AND denominator; the DuckDB oracle must
    mirror that.  TPC-H status/priority are never NULL, so this builds a
    null-bearing orders snapshot where a NULL group would WIN the mode
    by count if the oracle still grouped over all rows — the exact
    masked divergence."""
    import duckdb

    from parcial_bigdata_spark.operators.profiling import schema_drift
    from parcial_bigdata_spark.plans.registry import ORACLES

    rows = []
    # baseline period: 4x NULL status (would win an all-rows mode),
    # 3x 'F', 2x 'O'; priority has one NULL
    for i, (st, pr) in enumerate(
        [(None, "1-URGENT"), (None, "1-URGENT"), (None, None),
         (None, "2-HIGH"), ("F", "2-HIGH"), ("F", "2-HIGH"),
         ("F", "3-MEDIUM"), ("O", "3-MEDIUM"), ("O", "3-MEDIUM")]
    ):
        rows.append((i, "1998-01-0%d" % (i % 9 + 1), 100.0 + i, st, pr))
    # current period: NULL ties the mode count — non-null must still win
    for i, (st, pr) in enumerate(
        [(None, "1-URGENT"), (None, "5-LOW"), ("P", "5-LOW"), ("P", None)]
    ):
        rows.append((100 + i, "1998-06-0%d" % (i + 1), 200.0 + i, st, pr))

    orders = spark.createDataFrame(
        [(oid, f"{d} 00:00:00", p, st, pr) for oid, d, p, st, pr in rows],
        "o_orderkey long, o_orderdate string, o_totalprice double, "
        "o_orderstatus string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))

    got = {
        r.metric: r
        for r in schema_drift(orders, split_date="1998-05-01").collect()
    }
    # baseline: non-null mode is F (3 of 5 non-null) even though NULL
    # has 4 rows; current: P wins the 2-2 tie against NULL
    assert got["status_mode_share"].baseline == pytest.approx(3 / 5)
    assert got["status_mode_share"].current == pytest.approx(2 / 2)
    assert got["priority_mode_share"].baseline == pytest.approx(3 / 8)
    assert got["status_null_rate"].baseline == pytest.approx(4 / 9)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, TIMESTAMP '%s 00:00:00', %r, %s, %s)"
            % (
                oid,
                d,
                p,
                "NULL" if st is None else f"'{st}'",
                "NULL" if pr is None else f"'{pr}'",
            )
            for oid, d, p, st, pr in rows
        )
        + ") AS t(o_orderkey, o_orderdate, o_totalprice, "
        "o_orderstatus, o_orderpriority)"
    )
    oracle = {
        r[0]: r
        for r in con.execute(ORACLES["integrity_schema_drift"]).fetchall()
    }
    assert set(oracle) == set(got)
    for metric, row in oracle.items():
        g = got[metric]
        for a, b in [(row[1], g.baseline), (row[2], g.current),
                     (row[3], g.change)]:
            if a is None or b is None:
                assert a is None and b is None, (metric, a, b)
            else:
                assert a == pytest.approx(b, abs=1e-9), (metric, a, b)
