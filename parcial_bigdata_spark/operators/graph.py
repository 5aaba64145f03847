"""Iterative graph analytics beyond connectivity — PageRank by fixed
power iteration, entirely as DataFrame ops.

Beyond-reference capability (SURVEY.md §2.11 — the reference has no
graph surface): the influence/centrality companion of the
connected-components family (`operators/dedup.py:duplicate_components`).
CC answers "which records are the same thing"; PageRank answers "which
nodes matter", the standard link-quality signal a web-scale training
corpus pipeline computes over its crawl graph.

Design mirrors ``similarity.train_spherical_kmeans``: a FIXED iteration
count, not a convergence test — per-round cost is known, the result is
reproducible, and an unrolled SQL twin can verify it.  Per-round
lineage is cut with ``iter_checkpoint`` and the previous round's
blocks are released eagerly (same lifecycle as the CC star loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Ranks after ``iterations`` rounds of the power method over the
    DISTINCT edge set: ``r' = (1-d)/N + d · Σ r(u)/outdeg(u)`` over
    in-edges.  Returns (node, rank) for every vertex incident to an
    edge; null endpoints are dropped (no identity).

    Textbook simplified variant: dangling-node mass leaks (no
    redistribution term) — deterministic, and exactly mirrored by the
    unrolled DuckDB oracle.  Rank sums therefore decay below 1 when
    sinks exist; relative ordering — the signal PageRank is used for —
    is unaffected.

    Scale shape (per round, the standard distributed PageRank plan):
    one shuffle join of ranks onto the edge list by source, one
    map-side-combining groupBy on destination for the in-sums, one
    left join back onto the vertex set.  Nothing but (node, rank)
    doubles ride any shuffle.  Hot destinations (a page every node
    links to) skew the groupBy key — that is why in-sums are a groupBy
    and not a window: AQE splits an oversized partial-aggregate
    partition at runtime.  The vertex count N travels as a broadcast
    single-row frame, never a driver-side action.
    """
    if iterations <= 0:
        raise ValueError("pagerank: iterations must be positive")
    if not 0.0 < damping < 1.0:
        raise ValueError("pagerank: damping must be in (0, 1)")
    missing = {src, dst} - set(edges.columns)
    if missing:
        raise ValueError(f"pagerank: edges missing columns: {sorted(missing)}")
    from parcial_bigdata_spark.operators.scale import (
        iter_checkpoint,
        release_checkpoint,
    )

    ed = iter_checkpoint(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
    )
    nodes = iter_checkpoint(
        ed.select(F.col("src").alias("node"))
        .unionByName(ed.select(F.col("dst").alias("node")))
        .distinct()
    )
    # out-degree of the distinct edge set; reused every round, so its
    # (shallow) lineage is cut once rather than re-aggregated per round
    deg = iter_checkpoint(
        ed.groupBy("src").agg(F.count(F.lit(1)).alias("__out_deg"))
    )
    total = F.broadcast(
        nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    )
    # teleport constant evaluated HERE (1.0 - damping in driver-side
    # float) so the oracle can reproduce the exact double by writing
    # the same subtraction — a 0.15 literal is 1 ulp away
    teleport = 1.0 - damping

    ranks = nodes.crossJoin(total).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank"), "__n"
    )
    prev: DataFrame | None = None
    for _ in range(iterations):
        in_sums = (
            ed.join(deg, "src")
            .join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__out_deg")).alias("__contrib"),
            )
            .groupBy("node")
            .agg(F.sum("__contrib").alias("__in_sum"))
        )
        new_ranks = iter_checkpoint(
            ranks.select("node", "__n")
            .join(in_sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport) / F.col("__n")
                    + F.lit(damping) * F.coalesce("__in_sum", F.lit(0.0))
                ).alias("rank"),
                "__n",
            )
        )
        # the new round is eagerly materialized; the previous round's
        # blocks are dead (round 0's ranks frame is plan-only — the
        # None guard skips it)
        release_checkpoint(prev)
        prev, ranks = new_ranks, new_ranks
    for frame in (ed, nodes, deg):
        release_checkpoint(frame)
    return ranks.select("node", "rank")
