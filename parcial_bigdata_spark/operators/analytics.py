"""Event-sequence analytics over the ``events`` table: funnel conversion
and retention cohorts — the bread-and-butter queries of a product
analytics engine, expressed as linear per-user aggregations (never a
self-join on the raw event stream).

Beyond-reference capability (SURVEY.md §2.11): the reference stores one
value series; these operators define the event-analytics surface a user
of a general engine expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered funnel: how many users completed each step AFTER their
    earliest completion of the previous step (classic earliest-
    completion semantics, strict ordering).

    Plan: one filtered min-aggregate per step on user_id — each is a
    partial-aggregated groupBy of a type-pruned scan, joined user-to-
    user.  Everything is linear in |events| and shuffles only
    |users|-sized frames after the first aggregate; no window over the
    raw stream, no event×event self-join, so the funnel holds at any
    event volume.  Step count is typically ≤5, so the chain depth is
    bounded."""
    if not steps:
        raise ValueError("steps must be non-empty")
    reached = (
        events.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    counts = [(0, steps[0], reached)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.where(F.col("event_type") == step)
            .join(reached.select("user_id", F.col("t").alias("prev_t")), "user_id")
            .where(F.col("ts") > F.col("prev_t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        counts.append((i, step, nxt))
        reached = nxt
    rows = None
    for i, step, frame in counts:
        c = frame.agg(F.count("*").alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(step).alias("step"), "n_users"
        )
        rows = c if rows is None else rows.unionByName(c)
    return rows.orderBy("step_idx")


def retention_cohorts(events: DataFrame, cohort_type: str = "signup") -> DataFrame:
    """Weekly retention triangle: users grouped by the week of their
    first ``cohort_type`` event, counted once per subsequent week they
    show ANY activity.

    Plan: first-seen week is one min-aggregate per user; activity weeks
    are a (user, week) distinct; one |users|-sized join keys them
    together and the triangle is a final groupBy — three linear
    shuffles on user_id/(cohort, offset), nothing pairwise.  Weeks are
    Monday-truncated dates, offset = whole weeks since cohort entry
    (activity before the cohort event is excluded)."""
    # weeks stay TIMESTAMP (Monday 00:00), not DATE — the oracle compare
    # renders dates and timestamps differently across engines
    week = F.date_trunc("week", F.col("ts"))
    cohort = (
        events.where(F.col("event_type") == cohort_type)
        .groupBy("user_id")
        .agg(F.min(week).alias("cohort_week"))
    )
    activity = events.select("user_id", week.alias("week")).distinct()
    return (
        activity.join(cohort, "user_id")
        .where(F.col("week") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
