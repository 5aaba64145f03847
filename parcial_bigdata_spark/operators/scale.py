"""Scale-posture operators: the techniques that keep joins/aggs flowing
at 100 TB — bucketed co-located joins, salted skew joins, partition
pruning.  None of these exist in the reference (single MySQL table,
sequential loop); they are the engine's answer to SURVEY.md §4's
"shuffle/spill" row and the 100 TB design requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Two tables bucketed the same way join WITHOUT any exchange — the
    shuffle is paid once at write time and amortized over every
    subsequent join.  This is the co-located fact-fact join strategy for
    recurring joins (orders ⋈ lineitem) at 100 TB."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
    force_sortmerge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables; with compatible bucketing Spark
    plans a SortMergeJoin with ZERO Exchange operators.

    ``force_sortmerge`` adds a merge hint — at dim-table sizes the
    planner would otherwise pick broadcast and ignore bucketing (which
    is the right call there; the bucketed path is for fact-fact)."""
    left = spark.table(left_table)
    if force_sortmerge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster join: salt the skewed (left) side's key with a random
    shard, replicate the right side across all shards, join on
    (key, salt).  A single hot key fans out over ``n_salts`` tasks
    instead of stalling one straggler partition.

    AQE's skewJoin handles moderate skew automatically; explicit salting
    is for the pathological case (one key = 30 % of the data) or for
    engines/strategies AQE cannot split (e.g. bucketed SMJ).  Results
    are identical to a plain join (salt columns never escape) for the
    supported join types; right/full outer are rejected because the
    replicated right side would emit each unmatched right row once per
    salt."""
    # Normalize Spark's join-type aliases (left_outer == leftouter == left,
    # semi == leftsemi, ...) before the safety check.  Everything
    # left-oriented is salt-safe: a left row matches iff its key exists in
    # the replicated right side, same as unsalted.
    canon = how.replace("_", "").lower()
    if canon not in ("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti joins, not "
            f"{how!r}: the right side is replicated per salt, so right/full "
            "outer would duplicate unmatched right rows"
        )
    salt = (F.rand(seed=42) * n_salts).cast("int")
    l_s = left.withColumn("_salt", salt)
    r_s = right.join(
        F.broadcast(
            left.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = l_s.join(r_s, [on, "_salt"], how)
    return out.drop("_salt")


def read_pruned(
    spark: SparkSession, path: str, partition_col: str, value
) -> DataFrame:
    """Partition-pruned scan of a partitioned dataset: the filter on the
    partition column is resolved against directory metadata — pruned
    partitions are never listed, opened, or read."""
    return spark.read.parquet(path).where(F.col(partition_col) == F.lit(value))
