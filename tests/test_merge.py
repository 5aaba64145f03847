"""merge_upsert semantics: the four MERGE INTO outcomes, null-key
identity rules, and schema validation."""

import pytest

from pyspark.sql import functions as F

from parcial_bigdata_spark.operators.merge import merge_upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, status string, price double",
    )


def test_merge_four_outcomes(spark):
    base = _base(spark)
    updates = spark.createDataFrame(
        [(2, "M", 200.0), (3, "M", 999.0), (4, "M", 40.0)],
        "k long, status string, price double",
    )
    out = {
        r.k: r
        for r in merge_upsert(
            base,
            updates,
            "k",
            update_cols=["price"],
            delete_when=lambda u: u["price"] > 500,
        ).collect()
    }
    # kept: untouched base row
    assert (out[1].status, out[1].price, out[1]["__merge_action"]) == ("a", 10.0, "kept")
    # updated: price from update row, status (not in update_cols) from base
    assert (out[2].status, out[2].price, out[2]["__merge_action"]) == ("b", 200.0, "updated")
    # deleted: matched row whose UPDATE value trips the predicate
    assert 3 not in out
    # inserted: takes the update row verbatim, including non-update cols
    assert (out[4].status, out[4].price, out[4]["__merge_action"]) == ("M", 40.0, "inserted")


def test_merge_null_update_value_wins_on_match(spark):
    # a matched update carrying NULL must overwrite (presence flags, not
    # coalesce) — the classic upsert-nulls-a-field case
    base = _base(spark)
    updates = spark.createDataFrame(
        [(1, "z", None)], "k long, status string, price double"
    )
    row = (
        merge_upsert(base, updates, "k", update_cols=["price"])
        .where(F.col("k") == 1)
        .collect()[0]
    )
    assert row.price is None and row["__merge_action"] == "updated"


def test_merge_null_keys_never_match(spark):
    base = spark.createDataFrame(
        [(None, "a", 1.0), (1, "b", 2.0)], "k long, status string, price double"
    )
    updates = spark.createDataFrame(
        [(None, "u", 9.0)], "k long, status string, price double"
    )
    rows = merge_upsert(base, updates, "k").collect()
    actions = sorted(r["__merge_action"] for r in rows)
    # base null-key row kept, update null-key row inserted, no cross-match
    assert actions == ["inserted", "kept", "kept"]


def test_merge_validates_schemas(spark):
    base = _base(spark)
    with pytest.raises(ValueError, match="missing merge columns"):
        merge_upsert(base, base.select("k", "status"), "k")
    with pytest.raises(ValueError, match="update_cols"):
        merge_upsert(base, base, "k", update_cols=["nope"])


# --- scd2_history ---------------------------------------------------

from parcial_bigdata_spark.operators.merge import scd2_history  # noqa: E402


def test_scd2_versions_and_validity(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "new"),
            (1, "2024-01-02 00:00:00", "new"),      # re-stated: collapses
            (1, "2024-01-03 00:00:00", "shipped"),
            (2, "2024-01-05 00:00:00", "new"),
        ],
        "k long, ts string, status string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {
        (r.k, r.version): r
        for r in scd2_history(ev, "k", "ts", ["status"]).collect()
    }
    assert set(rows) == {(1, 1), (1, 2), (2, 1)}
    v1, v2 = rows[(1, 1)], rows[(1, 2)]
    assert v1.status == "new" and str(v1.valid_from).startswith("2024-01-01")
    # valid_to is the NEXT version's valid_from — the Jan-2 restatement
    # collapsed into v1, so v1 stays valid until the Jan-3 change
    assert str(v1.valid_to).startswith("2024-01-03") and v1.is_current is False
    assert v2.status == "shipped" and v2.valid_to is None and v2.is_current
    assert rows[(2, 1)].is_current


def test_scd2_simultaneous_events_are_deterministic_versions(spark):
    # two different states at the same timestamp: attribute tiebreak
    # orders them; the earlier becomes a zero-duration version
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a"), (1, "2024-01-01 00:00:00", "b")],
        "k long, ts string, status string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = sorted(
        scd2_history(ev, "k", "ts", ["status"]).collect(), key=lambda r: r.version
    )
    assert [r.status for r in rows] == ["a", "b"]
    assert rows[0].valid_to == rows[1].valid_from and rows[1].is_current


def test_scd2_all_null_first_version_survives(spark):
    # eqNullSafe(NULL, lag=NULL) is true — the explicit first-row flag
    # must keep an all-null opening version
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", None), (1, "2024-01-02 00:00:00", "x")],
        "k long, ts string, status string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = sorted(
        scd2_history(ev, "k", "ts", ["status"]).collect(), key=lambda r: r.version
    )
    assert len(rows) == 2 and rows[0].status is None and rows[1].status == "x"


def test_scd2_validates_inputs(spark):
    ev = _base(spark)
    with pytest.raises(ValueError, match="empty attr_cols"):
        scd2_history(ev, "k", "price", [])
    with pytest.raises(ValueError, match="missing columns"):
        scd2_history(ev, "k", "price", ["nope"])


def test_scd2_single_shuffle(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a")], "k long, ts string, status string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = (
        scd2_history(ev, "k", "ts", ["status"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# incremental aggregate maintenance
# ---------------------------------------------------------------------------

def test_maintain_grouped_agg_insert_delete_dropout(spark):
    from parcial_bigdata_spark.operators.merge import maintain_grouped_agg

    base = spark.createDataFrame(
        [("A", 2, 30.0), ("B", 1, 5.5)], "k string, n_rows long, total double"
    )
    changes = spark.createDataFrame(
        [
            ("A", 10.25, 1),   # insert into existing group
            ("B", 5.5, -1),    # delete the only B row -> group drops out
            ("C", 7.0, 1),     # brand-new group
        ],
        "k string, v double, op int",
    )
    got = {
        r.k: (r.n_rows, r.total)
        for r in maintain_grouped_agg(base, changes, ["k"], "v").collect()
    }
    assert got == {"A": (3, 40.25), "C": (1, 7.0)}


def test_maintain_grouped_agg_untouched_groups_pass_through(spark):
    from parcial_bigdata_spark.operators.merge import maintain_grouped_agg

    base = spark.createDataFrame(
        [("A", 4, 100.0)], "k string, n_rows long, total double"
    )
    changes = spark.createDataFrame([], "k string, v double, op int")
    rows = maintain_grouped_agg(base, changes, ["k"], "v").collect()
    assert [(r.k, r.n_rows, r.total) for r in rows] == [("A", 4, 100.0)]


def test_maintain_grouped_agg_rejects_bad_op(spark):
    import pytest as _pt

    from parcial_bigdata_spark.operators.merge import maintain_grouped_agg

    base = spark.createDataFrame(
        [("A", 1, 1.0)], "k string, n_rows long, total double"
    )
    changes = spark.createDataFrame(
        [("A", 1.0, 2)], "k string, v double, op int"
    )
    with _pt.raises(Exception, match="op must be"):
        maintain_grouped_agg(base, changes, ["k"], "v").collect()
    with _pt.raises(ValueError, match="missing 'op'"):
        maintain_grouped_agg(base, changes.drop("op"), ["k"], "v")
