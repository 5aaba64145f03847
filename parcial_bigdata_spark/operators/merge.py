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

import functools
from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame, Window
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


def scd2_history(
    events: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from a change
    event stream: one row per (key, attribute-state) VERSION with
    ``valid_from`` / ``valid_to`` validity bounds, a 1-based
    ``version`` counter, and an ``is_current`` flag on the open row.

    The third table-maintenance primitive alongside ``snapshot_diff``
    (detect) and ``merge_upsert`` (apply): where MERGE keeps only the
    latest state, SCD-2 keeps every state with the interval it was
    true for — the dimension-table shape every warehouse load needs
    and the reference's append-only MySQL sink
    (`/root/reference/lambda/subirDB.py:116`) approximates by never
    deleting.

    Semantics:
    - events are ordered per key by (``ts_col``, *attr_cols) — the
      attribute tiebreak makes simultaneous events deterministic
      (each becomes its own zero-duration version)
    - consecutive events with identical attributes (null-safe
      comparison) collapse into the earlier version — re-stating the
      same state is not a change
    - ``valid_to`` is the NEXT version's ``valid_from``
      (half-open intervals, NULL = still current)

    Plan shape: ONE shuffle on the key.  Both window passes (change
    detection, then validity/versioning over the filtered survivors)
    share the same partitioning and ordering, so Catalyst plans a
    single exchange + sort and the filter between them preserves both.
    At 100 TB the key is the dimension's natural key — high
    cardinality, no hot partitions — and nothing rides the shuffle
    except the key, timestamp, and tracked attributes.
    """
    if not attr_cols:
        raise ValueError("scd2_history: empty attr_cols")
    missing = {key, ts_col, *attr_cols} - set(events.columns)
    if missing:
        raise ValueError(f"scd2_history: events missing columns: {sorted(missing)}")

    w = Window.partitionBy(key).orderBy(ts_col, *attr_cols)
    # lag over a literal distinguishes "first row of the key" from
    # "previous attributes were all NULL" — eqNullSafe(NULL, NULL) is
    # true, so an all-null first version would otherwise be dropped
    is_first = F.lag(F.lit(1)).over(w).isNull()
    unchanged = functools.reduce(
        Column.__and__,
        [F.col(c).eqNullSafe(F.lag(c).over(w)) for c in attr_cols],
    )
    changes = (
        events.select(key, ts_col, *attr_cols)
        .withColumn("__keep", is_first | ~unchanged)
        .where(F.col("__keep"))
    )
    return changes.select(
        key,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def maintain_grouped_agg(
    base_agg: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Incremental materialized-aggregate maintenance (the classic
    delta-maintenance rewrite): update a grouped (n_rows, sum) table
    from a signed change batch WITHOUT re-scanning the base fact table.

    ``base_agg`` carries (keys..., n_rows, total) — the materialized
    state; ``changes`` carries raw rows with ``op_col`` = +1 (insert)
    or -1 (delete).  The delta aggregates first (map-side combine, one
    shuffle of |change groups| rows), then a full-outer join on the
    group key merges it in; groups whose maintained count reaches 0
    drop out.  Cost is O(|changes| + |touched groups|) — never
    O(|base table|), which is the entire point at 100 TB: a day's CDC
    feed maintains a year's aggregate.

    Sums accumulate in DECIMAL(18,4) (the ``money_sum`` contract):
    retraction arithmetic on doubles drifts with partial-sum order,
    decimal addition/subtraction is exact and order-free, so the
    maintained total is BIT-IDENTICAL to recomputing the aggregate
    from scratch — pinned by the registry oracle, which recomputes.
    Rounding to the output scale happens here, at the read edge.
    """
    if op_col not in changes.columns:
        raise ValueError(f"maintain_grouped_agg: changes missing {op_col!r}")
    missing = set(keys) - set(base_agg.columns)
    if missing:
        raise ValueError(f"maintain_grouped_agg: base_agg missing {sorted(missing)}")
    op = F.col(op_col)
    delta = (
        changes.withColumn(
            # inverted test so a NULL op lands in the bad branch too
            "__bad", F.when(op.isin(1, -1), F.lit(0)).otherwise(F.lit(1))
        )
        .groupBy(*keys)
        .agg(
            F.sum(op).alias("__dn"),
            F.sum(op * F.col(value_col).cast("decimal(18,4)")).alias("__dsum"),
            F.sum("__bad").alias("__nbad"),
        )
    )
    merged = (
        base_agg.select(
            *keys,
            F.col("n_rows").alias("__bn"),
            F.col("total").cast("decimal(18,4)").alias("__bsum"),
        )
        .join(delta, keys, "full_outer")
        .select(
            *keys,
            (F.coalesce("__bn", F.lit(0)) + F.coalesce("__dn", F.lit(0))).alias(
                "n_rows"
            ),
            (
                F.coalesce(F.col("__bsum"), F.lit(0).cast("decimal(18,4)"))
                + F.coalesce(F.col("__dsum"), F.lit(0).cast("decimal(18,4)"))
            ).alias("__sum"),
            F.coalesce("__nbad", F.lit(0)).alias("__nbad"),
        )
    )
    # invalid ops surface as an error, not silent corruption — checked
    # per-group inside the same pass (no extra action)
    guarded = merged.withColumn(
        "__sum",
        F.when(
            F.col("__nbad") > 0,
            F.raise_error(F.lit("maintain_grouped_agg: op must be +1 or -1")),
        ).otherwise(F.col("__sum")),
    )
    return (
        guarded.where(F.col("n_rows") > 0)
        .select(
            *keys,
            "n_rows",
            F.round(F.col("__sum"), 2).cast("double").alias("total"),
        )
    )


def compaction_plan(
    lineitem: DataFrame, n_files: int = 200, target_rows: int = 8192
) -> DataFrame:
    """Small-file compaction plan (`maintenance_compaction_plan`): given
    a file census (simulated here by hashing lineitem into ``n_files``
    pmod buckets — the shape a real census reads from the table log),
    assign files to compaction bins of ~``target_rows`` rows via the
    deterministic sort-descending + cumulative-quota rule: files sort
    by (rows desc, file id), and a file opens a new bin whenever the
    running total crosses the next target boundary — the one-pass
    distributed form of first-fit-decreasing that OPTIMIZE-style table
    maintenance runs before rewriting.

    Exact/deterministic: integer row counts, integer `div` bin
    assignment (bin = floor((cumsum − rows) / target)); oversized
    files (> target) own their bin span by construction.  Scale: the
    census aggregate is map-side; the cumulative window runs over the
    |files|-row census (the documented post-aggregation pattern — a
    real table's file count is dimension-sized), never over rows."""
    from pyspark.sql.window import Window

    census = lineitem.groupBy(
        F.pmod(F.col("l_orderkey"), F.lit(n_files)).cast("long").alias(
            "file_id"
        )
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.orderBy(F.col("n_rows").desc(), F.col("file_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    planned = census.select(
        "file_id",
        "n_rows",
        F.sum("n_rows").over(w).alias("__cum"),
    ).select(
        "file_id",
        "n_rows",
        F.expr(
            f"CAST(((__cum - n_rows) div {int(target_rows)}) AS BIGINT)"
        ).alias("bin"),
    )
    return (
        planned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("total_rows"),
            F.min("n_rows").alias("min_file_rows"),
            F.max("n_rows").alias("max_file_rows"),
        )
        .orderBy("bin")
    )
