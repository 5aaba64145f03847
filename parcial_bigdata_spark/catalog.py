"""Table catalog over the driver-generated Parquet layout.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file/dir per table at
``{sf_dir}/{name}.parquet``.

Parquet is the columnar at-rest format (vectorized reader, row-group
statistics for predicate pushdown, column pruning) — the architecture
upgrade over the reference's row-oriented MySQL table (SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # The fixture stores ts as parquet TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects.  Read nanos as long, then floor-divide
        # to microseconds (integer `div` — a double would lose precision at
        # 1.7e18 ns).  The DuckDB oracles apply the matching CAST(ts AS
        # TIMESTAMP) truncation.
        # The raw bigint rides along as ``ts_nanos``: filters on the DERIVED
        # ts column cannot reach the scan, but interval operators translate
        # their bounds to nanos and filter ts_nanos — a pure alias of the
        # parquet column — so range predicates DO push into row-group
        # pruning (PushedFilters on ts).  Unused, the column is pruned away.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts_nanos", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def create_silver_table(spark: SparkSession, table: str = "dolar", location: str | None = None) -> None:
    """Idempotent silver DDL (S7) — the reference's CREATE TABLE IF NOT
    EXISTS ``dolar(fechahora DATETIME NOT NULL, valor DECIMAL(12,4) NOT
    NULL)`` (``lambda/subirDB.py:71-77``), upgraded to partitioned
    parquet: date partitioning gives the dynamic partition pruning the
    unindexed MySQL table never had (SURVEY.md §4)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} (
            fechahora TIMESTAMP NOT NULL,
            valor DECIMAL(12,4) NOT NULL,
            source_file STRING,
            dt DATE
        ) USING parquet PARTITIONED BY (dt){loc}
        """
    )
