"""Interval query — the reference's one real query.

Reference: ``main.py:61-86`` — closed-interval timestamp filter (P2),
2-column projection (P4), ascending sort (O1), row count in the response
envelope (A1), DECIMAL→float downcast at the edge (T4).

Spark-first: a declarative filter+project+sort plan.  Catalyst pushes the
range predicate into the Parquet scan (row-group min/max pruning) and
prunes unread columns, so at 100 TB only the matching row groups of two
columns ever leave storage — unlike the reference's unindexed full scan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _range_filter(df: DataFrame, ts_col: str, start, end) -> DataFrame:
    """Closed-interval filter on ``ts_col``, pushdown-aware.

    When the table carries a raw ``{ts_col}_nanos`` bigint companion (the
    events fixture stores TIMESTAMP(NANOS), which Spark reads as long —
    see catalog.load_table), the bounds are translated to nanos and the
    filter lands on the raw column instead: ``ts = timestamp_micros(raw
    div 1000)``, so ``start <= ts <= end`` ⟺ ``micros(start)*1000 <= raw
    <= micros(end)*1000 + 999`` (floor-division algebra, lossless).  The
    bound expressions are foldable, so Catalyst folds them to long
    literals and pushes the comparison into the parquet scan — row-group
    min/max pruning on the biggest time-series table, instead of a full
    scan + post-filter on the derived timestamp."""
    ts = F.col(ts_col)
    nanos_col = f"{ts_col}_nanos"
    if nanos_col in df.columns:
        lo = F.unix_micros(F.to_timestamp(F.lit(start))) * 1000
        hi = F.unix_micros(F.to_timestamp(F.lit(end))) * 1000 + 999
        return df.where(F.col(nanos_col).between(lo, hi))
    return df.where(ts.between(F.lit(start), F.lit(end)))


def interval(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    start: dt.datetime | str | Column,
    end: dt.datetime | str | Column,
) -> DataFrame:
    """Rows with ``start <= ts <= end``, ascending by ts, two columns.

    Matches the reference's ``WHERE fechahora >= %s AND fechahora <= %s
    ORDER BY fechahora ASC`` with the ``float(valor)`` downcast.
    """
    ts = F.col(ts_col)
    return (
        _range_filter(df, ts_col, start, end)
        .orderBy(ts.asc())
        .select(ts.alias(ts_col), F.col(value_col).cast("double").alias(value_col))
    )


def interval_count(
    df: DataFrame,
    ts_col: str,
    start: dt.datetime | str | Column,
    end: dt.datetime | str | Column,
) -> DataFrame:
    """The response-envelope ``count`` (reference ``main.py:85-86``) as a
    single-row aggregate — computed distributed, never via driver len()."""
    return _range_filter(df, ts_col, start, end).agg(F.count("*").alias("cnt"))


def validate_range(start: dt.datetime, end: dt.datetime) -> None:
    """Request guard (reference ``main.py:63-64``): reject end <= start."""
    if end <= start:
        raise ValueError("'end' must be greater than 'start'")
