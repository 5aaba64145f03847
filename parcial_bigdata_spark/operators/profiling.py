"""Data profiling utilities — the ANALYZE-style introspection a user
points at a new table before writing queries, and the key-distribution
diagnostic that finds skew (salting/AQE-split candidates) before a big
join burns a cluster on one hot partition.

Both are single-scan linear aggregates; neither collects anything to
the driver.
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
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__d_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', __n_{c}, __d_{c}" for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)"
        )
    ).orderBy("col_name")


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
        .orderBy(F.col("n_rows").desc(), F.col("key_value").asc())
        .limit(top_n)
    )
