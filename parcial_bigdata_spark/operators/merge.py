"""Batch MERGE (upsert/CDC-apply) — the write-side companion of
``profiling.snapshot_diff``'s CDC audit.

The reference's load path is blind at-least-once JDBC append
(`/root/reference/lambda/subirDB.py:116` — re-delivered S3 events
re-insert rows); the streaming pipeline already upgrades that to
idempotent exactly-once (`streaming/pipeline.py` ST3).  This module
adds the general table-maintenance primitive those two imply: apply a
keyed batch of changes to a base snapshot with Delta-`MERGE INTO`
semantics — WHEN MATCHED UPDATE (or DELETE), WHEN NOT MATCHED INSERT.

Plan shape: ONE shuffle join on the merge key — exactly the shape
Delta/Iceberg MERGE lowers to.  Payload columns ride the join (the
output needs them), but there is no second pass, no window, and no
driver-side anything.  At 100 TB the production refinement is file
pruning before the join (inner-join discovery pass → rewrite only
touched files, which Delta calls dynamic file pruning) — the merge
semantics here are what that machinery wraps.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    update_cols: list[str] | None = None,
    delete_when: Callable[[Mapping[str, Column]], Column] | None = None,
) -> DataFrame:
    """Apply ``updates`` to ``base`` keyed on ``key``; returns the
    merged table plus a ``__merge_action`` column (kept / updated /
    inserted).

    - matched + ``delete_when`` → row dropped.  The predicate is a
      callable receiving the UPDATE row's columns as a name→Column
      mapping (``lambda u: u["o_totalprice"] > 2e5``) — a plain Column
      could not be re-bound to the join's internal aliases
    - matched otherwise → ``update_cols`` take the update row's values,
      every other column keeps the base row's value
    - update row with no base match → inserted verbatim
    - base row with no update match → kept verbatim

    Presence is tracked with explicit flags, never column nullness: an
    update row may legitimately carry NULL in an updated column, and a
    NULL in the key column never matches anything (its identity is
    unknowable), so null-key rows pass through as kept/inserted rather
    than cross-joining — same contract as ``snapshot_diff``.
    """
    cols = [c for c in base.columns if c != key]
    missing = set([key] + cols) - set(updates.columns)
    if missing:
        raise ValueError(f"updates missing merge columns: {sorted(missing)}")
    upd_set = set(update_cols if update_cols is not None else cols)
    unknown = upd_set - set(cols)
    if unknown:
        raise ValueError(f"update_cols not in base (or the key): {sorted(unknown)}")

    b = base.select(
        F.col(key).alias("__b_key"),
        F.lit(True).alias("__b_present"),
        *[F.col(c).alias(f"__b_{c}") for c in cols],
    )
    u = updates.select(
        F.col(key).alias("__u_key"),
        F.lit(True).alias("__u_present"),
        *[F.col(c).alias(f"__u_{c}") for c in cols],
    )
    joined = b.join(u, F.col("__b_key") == F.col("__u_key"), "full_outer")

    matched = F.col("__b_present").isNotNull() & F.col("__u_present").isNotNull()
    if delete_when is not None:
        u_cols = {c: F.col(f"__u_{c}") for c in cols} | {key: F.col("__u_key")}
        joined = joined.withColumn("__delete", matched & delete_when(u_cols))
    else:
        joined = joined.withColumn("__delete", F.lit(False))

    action = (
        F.when(F.col("__b_present").isNull(), F.lit("inserted"))
        .when(F.col("__u_present").isNull(), F.lit("kept"))
        .otherwise(F.lit("updated"))
    )
    out_cols = [F.coalesce("__b_key", "__u_key").alias(key)]
    for c in cols:
        if c in upd_set:
            value = F.when(
                F.col("__u_present").isNotNull(), F.col(f"__u_{c}")
            ).otherwise(F.col(f"__b_{c}"))
        else:
            value = F.when(
                F.col("__b_present").isNotNull(), F.col(f"__b_{c}")
            ).otherwise(F.col(f"__u_{c}"))
        out_cols.append(value.alias(c))
    return (
        joined.where(~F.col("__delete"))
        .select(*out_cols, action.alias("__merge_action"))
    )
