"""flink_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference CDC ETL
pipeline (jiamx/flink-etl: Kafka binlog ingest -> event-time partitioned
files -> daily snapshot/delta merge), built Spark-first on the DataFrame /
Structured Streaming API and extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
column plumbing).

Design rules (see SURVEY.md):
  * declare logical plans with DataFrame/SQL, let Catalyst pick physical
    strategy — no hand-scheduling, no RDDs on data paths
  * built-in `pyspark.sql.functions` in hot paths; Arrow-batched pandas
    UDFs only where JVM expressions genuinely can't express the semantics
  * never collect() on a data path; everything must hold at 1000 executors
"""

__version__ = "0.1.0"

from flink_etl_spark.session import get_spark  # noqa: F401
