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
