"""JDBC table scan/sink (S5/S6) — the reference's MySQL boundary.

Reference: batch INSERT via ``executemany`` (``lambda/subirDB.py:116``)
and a parameterized SELECT (``main.py:76-81``).  In Spark both become
the JDBC DataFrame connector with the knobs that matter at scale:

- scan: ``pushDownPredicate`` ships WHERE clauses to the database;
  ``partitionColumn/lowerBound/upperBound/numPartitions`` split the read
  into parallel range queries instead of one giant cursor.
- sink: ``batchsize`` groups inserts per round-trip (the executemany
  analogue); ``isolationLevel=READ_COMMITTED`` and append mode match the
  reference's autocommit appends.

Tested LIVE against embedded Apache Derby (already on the Spark
classpath as the Hive-metastore engine): the round-trip test writes
real rows, reads them back, asserts WHERE clauses arrive as
``PushedFilters`` in the JDBC scan node, and splits a bounded
partition-column read into parallel range queries.  Any server-class
database (the reference's MySQL included) works the same way given its
driver jar on the cluster classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int | None = None,
) -> DataFrameReader:
    """Configured JDBC scan (S6).  Call ``.load()`` where a driver jar
    exists.  ``dbtable`` accepts a subquery alias for pre-pushdown."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("pushDownPredicate", "true")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the connector as the literal "None"
            # and fail cryptically at load time on a live database
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrameWriter:
    """Configured JDBC append sink (S5).  Call ``.save()`` where a driver
    jar exists; ``batchsize`` is the executemany-style batching."""
    writer = (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "READ_COMMITTED")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer
