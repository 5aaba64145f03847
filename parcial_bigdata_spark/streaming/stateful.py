"""Custom stateful streaming operator via applyInPandasWithState —
the ST7 extension slot (SURVEY.md §2.9): per-key state the built-in
windowed aggregates cannot express (running lifetime totals that
survive across micro-batches and emit an update per batch).

State design for a cluster: state is per user_id (high cardinality →
even distribution), a fixed-width row (counters only, no row buffering),
and the state store checkpoints with the query — restart-safe."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [mx],
        }
    )


def streaming_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user lifetime totals, one updated row per user per
    micro-batch.  ``update`` output mode: only touched keys emit."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ZSCORE_OUTPUT_SCHEMA = (
    "user_id long, event_id long, n_prior long, scored int, is_outlier int"
)
ZSCORE_STATE_SCHEMA = "n long, s long, q long"
_Z2 = 9  # z = 3, squared — matches the batch outlier gate


def _update_running_zscore(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-event PREFIX z-score against the user's history so far —
    the real-time anomaly gate.  The decision predicate is the same
    division/sqrt-cleared EXACT integer rule as the batch
    ``value_outliers_exact``:

        (n·v − S)² · (n−1)  >  z² · n · (n·Q − S²)

    over cents-grid ints, with (n, S, Q) the moments of STRICTLY
    EARLIER events (an event never scores against itself; n ≥ 3
    required).  State is three int64 counters per user — fixed width,
    no row buffering ACROSS batches; within a batch the group's Arrow
    chunks are concatenated and sorted ONCE (Spark delivers a large
    group as multiple chunks in no guaranteed relative order, so
    per-chunk sorting would break the strictly-earlier contract for
    users wider than one chunk).  The whole transition runs in PYTHON
    INTS: the predicate terms reach ~1e22 and even the Q accumulation
    can exceed int64 over a long-lived high-value user — numpy would
    silently wrap exactly where exactness is the contract.  The state
    STORE is still int64 by schema: a user whose lifetime Σv² passes
    2^63 (≈9M events at $10k values) fails the state write LOUDLY
    (Arrow cast error), never silently."""
    (user_id,) = key
    n, s, q = (
        tuple(int(x) for x in state.get) if state.exists else (0, 0, 0)
    )
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"])
    priors, flags = [], []
    for v in (int(x) for x in pdf["v_cents"]):
        priors.append(n)
        if n < 3:
            flags.append(0)
        else:
            lhs = (n * v - s) ** 2 * (n - 1)
            rhs = _Z2 * n * (n * q - s * s)
            flags.append(1 if lhs > rhs else 0)
        n += 1
        s += v
        q += v * v
    state.update((n, s, q))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": pdf["event_id"].to_numpy(),
            "n_prior": pd.array(priors, dtype="int64"),
            "scored": pd.array(
                [1 if p >= 3 else 0 for p in priors], dtype="int32"
            ),
            "is_outlier": pd.array(flags, dtype="int32"),
        }
    )


def streaming_running_zscore(events: DataFrame) -> DataFrame:
    """Stateful streaming anomaly detector: per-event prefix z-score
    flags via ``applyInPandasWithState``.  The cents column is computed
    by SPARK expressions before the Python stage (the engine-proven
    double→decimal(18,2) cast), so the Python transition never
    re-derives rounding.  On an event-time-ordered bounded replay (one
    AvailableNow batch per user) the emitted rows equal the batch
    window formulation exactly — the SQL oracle."""
    with_cents = events.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v_cents"),
    )
    return with_cents.groupBy("user_id").applyInPandasWithState(
        _update_running_zscore,
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_zscore_available_now(spark, events_parquet: str) -> DataFrame:
    """streaming_running_zscore under AvailableNow (append-mode memory
    sink): the bounded single-batch replay sorts each user's events by
    (ts, event_id) inside the state transition, so the emitted
    per-event decisions equal the batch prefix-window formulation —
    its SQL oracle."""
    from parcial_bigdata_spark.streaming.windows import _run_available_now

    return _run_available_now(
        spark,
        events_parquet,
        streaming_running_zscore,
        "stream_running_zscore_result",
        output_mode="append",
    ).orderBy("user_id", "event_id")
