"""parcial_bigdata_spark — a PySpark-native analytics engine.

Re-implements (Spark-first, not a port) the query and data-processing
capabilities of the reference pipeline ``sabogal9988/parcial-BigData``
(see SURVEY.md), extended with the operators a large-scale training-data
pipeline needs: deduplication, similarity search, multimodal column
plumbing, and text analysis.

Architecture: DataFrame/SQL logical plans optimized by Catalyst, columnar
Parquet at rest, whole-stage-codegen'd built-in expressions on every hot
path.  Python UDFs appear only as Arrow-batched pandas UDFs in the few
operators whose semantics the built-ins cannot express (multimodal decode
stubs).  Designed for a multi-executor cluster at ~100 TB: broadcast joins
for dims, partial aggregation everywhere, no driver-side collect in any
operator, AQE on.
"""

from parcial_bigdata_spark.session import get_spark, tune_runtime
from parcial_bigdata_spark.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "tune_runtime", "TABLES", "load_table", "register_views"]
