"""CSV source/sink coverage (S-family extension): schema'd CSV scan
with PERMISSIVE per-row parsing and corrupt-record accounting — the
same drop-and-count contract the reference's JSON ingest carries
(SURVEY.md §2.2 P6), applied to the one common landing format the
bronze pipeline doesn't otherwise touch.

Reference parity note: the reference ingests JSON only
(`lambda/subirDB.py`); CSV is declared extension surface.  The
semantics mirror ``ingest.parse_rows``: a malformed row never kills
the scan, it lands in the corrupt-record column and is COUNTED.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CSV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("_corrupt", T.StringType(), True),
    ]
)

# Deterministic malformed rows (long-typed columns carrying text):
# injected alongside the good export so the PERMISSIVE path is actually
# exercised — the count is part of the oracle contract.  All three are
# TYPE mismatches: Spark's CSV PERMISSIVE mode null-fills short rows
# without marking them corrupt, so ragged rows would blur the contract.
BAD_LINES = [
    "not_a_long,7,click",
    "12,not_a_long_either,view",
    "x,y,purchase",
]


def write_events_csv(spark: SparkSession, events: DataFrame, out_dir: str) -> str:
    """CSV SINK: export (event_id, user_id, event_type) as headerless
    CSV part files (distributed write, no driver collect), plus one
    text file of deterministic malformed lines."""
    events.select("event_id", "user_id", "event_type").write.mode(
        "overwrite"
    ).csv(out_dir)
    spark.createDataFrame(
        [(line,) for line in BAD_LINES], "value string"
    ).coalesce(1).write.mode("append").text(out_dir)
    return out_dir


def read_events_csv_accounting(spark: SparkSession, csv_dir: str) -> DataFrame:
    """CSV SCAN with the permissive drop-and-count contract: schema'd
    read, malformed rows routed to the corrupt-record column, one
    single-scan accounting row (total / valid / corrupt / exact id
    sum) plus per-type valid counts.

    COLUMN-PRUNING GOTCHA (pinned by the oracle): Spark's CSV reader
    only PARSES the columns the query references, so a type failure in
    an unreferenced column never fires and the row silently counts as
    valid — the accounting must therefore touch EVERY schema column it
    wants validated (observed live: dropping user_id from the
    aggregate let `12,not_a_long_either,view` through as valid).

    Scale: the scan streams at file parallelism; accounting is one
    stacked map-side aggregate — adding a counter never adds a scan."""
    raw = (
        spark.read.schema(CSV_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(csv_dir)
    )
    ok = F.col("_corrupt").isNull()
    return raw.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(ok.cast("long")).alias("n_valid"),
        F.sum((~ok).cast("long")).alias("n_corrupt"),
        F.sum(F.when(ok, F.col("event_id"))).alias("sum_event_id"),
        F.sum(F.when(ok, F.col("user_id"))).alias("sum_user_id"),
        F.countDistinct(F.when(ok, F.col("event_type"))).alias("n_types"),
    )


def csv_roundtrip_accounting(
    spark: SparkSession, events: DataFrame, out_dir: str
) -> DataFrame:
    """Full sink → scan round trip for the driver gate: the oracle is
    pure arithmetic on the events table plus the literal bad-line
    count, so a parsing regression (delimiter, type coercion, corrupt
    routing) breaks the hash."""
    write_events_csv(spark, events, out_dir)
    return read_events_csv_accounting(spark, out_dir)
