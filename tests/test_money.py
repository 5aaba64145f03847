"""money_sum: exact, order-independent, half-away rounding at halves."""

from __future__ import annotations

from pyspark.sql import functions as F

from parcial_bigdata_spark.functions.money import money_sum


def test_money_sum_rounds_exact_halves_away_from_zero(spark):
    """2183640.655 must round to .66 (half away), not .65 — the exact
    boundary that diverged between engines when summed in double."""
    df = spark.createDataFrame(
        [(2183640.65,), (0.005,)], "v double"
    )
    out = df.agg(money_sum("v", cast="decimal(18,4)").alias("s")).collect()[0].s
    assert out == 2183640.66
    neg = spark.createDataFrame([(-2183640.65,), (-0.005,)], "v double")
    out = neg.agg(money_sum("v", cast="decimal(18,4)").alias("s")).collect()[0].s
    assert out == -2183640.66


def test_money_sum_order_independent_across_partitions(spark):
    """The same multiset summed under different partitionings gives the
    same cents — the double-sum partial-order hazard money_sum removes."""
    rows = [(float(f"{i}.{i % 100:02d}"),) for i in range(1, 2001)]
    a = spark.createDataFrame(rows, "v double").repartition(1)
    b = spark.createDataFrame(list(reversed(rows)), "v double").repartition(32)
    sa = a.agg(money_sum("v").alias("s")).collect()[0].s
    sb = b.agg(money_sum("v").alias("s")).collect()[0].s
    assert sa == sb
