"""Set operators (SURVEY.md §2.8 — absent in reference, declared
capability).  INTERSECT/EXCEPT plan as semi/anti hash joins after
distinct; UNION is a zero-shuffle concatenation."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _custkeys_in_year(orders: DataFrame, year: int) -> DataFrame:
    return (
        orders.where(F.year("o_orderdate") == year)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


def repeat_customers(orders: DataFrame, y1: int = 1995, y2: int = 1996) -> DataFrame:
    """INTERSECT: customers active in both years."""
    return _custkeys_in_year(orders, y1).intersect(_custkeys_in_year(orders, y2)).orderBy("custkey")


def churned_customers(orders: DataFrame, y1: int = 1995, y2: int = 1996) -> DataFrame:
    """EXCEPT: active in y1 but not y2."""
    return _custkeys_in_year(orders, y1).exceptAll(_custkeys_in_year(orders, y2)).orderBy("custkey")


def status_bag_overlap(orders: DataFrame, y1: int = 1995, y2: int = 1996) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL (bag semantics): per-status order
    multiplicities common to both years, and y1's surplus — multiplicity
    math (min/difference of counts) the DISTINCT variants throw away.
    Plans as a count-aggregate per side + one join: no row explosion."""
    def bag(year: int) -> DataFrame:
        return orders.where(F.year("o_orderdate") == year).select("o_orderstatus")

    both = bag(y1).intersectAll(bag(y2)).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_common")
    )
    surplus = bag(y1).exceptAll(bag(y2)).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_surplus_y1")
    )
    return (
        both.join(surplus, "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.coalesce("n_surplus_y1", F.lit(0)).alias("n_surplus_y1"),
        )
        .orderBy("o_orderstatus")
    )


def all_party_keys(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """UNION ALL then distinct over heterogeneous sources brought to a
    common schema — the multi-file-append semantics of the reference's
    ingest loop (SURVEY.md §2.8) expressed relationally."""
    c = customer.select(F.col("c_custkey").alias("party_key"), F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_suppkey").alias("party_key"), F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct().orderBy("party_key", "nationkey")
