"""Registry-wide contract test: every queries() entry runs at sf0.001,
returns a stable schema, and has either an oracle twin or a documented
approximate-op exemption.  Mirrors the driver's smoke check."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# Approximate operators exempt from the SQL oracle by design (recall<1 or
# sketch-valued); each has an oracle-checked exact ground-truth twin.
NO_ORACLE_OK = {
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",  # approximate recall; exact label-blocked twin is oracle-checked
    "approx_distinct_parts",
    "approx_percentile_value_by_type",  # sketch; exact twin is oracle-checked
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert len(df.schema.fields) > 0
    assert df.count() >= 0


def test_every_query_has_oracle_or_exemption():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle for unknown query"
    missing = set(q) - set(o) - NO_ORACLE_OK
    assert not missing, f"queries without oracle or exemption: {missing}"


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_is_deterministic_schema(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    cols = df.columns
    assert cols == sorted(set(cols), key=cols.index), f"duplicate columns in {name}"
    n = df.count()
    assert n >= 0
