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
