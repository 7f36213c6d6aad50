"""Kafka source builders (S1, SURVEY.md §2.1).

Thin config-to-options mapping; the streaming entry point lives in
streaming/ingest.py. Batch mode reads a bounded offset range — useful
for replay/backfill jobs (`startingOffsets=earliest` mirrors
HdfsSink.java:54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.config import KafkaSourceConfig


def read_batch(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    """Bounded Kafka read (earliest..latest) as raw strings."""
    reader = spark.read.format("kafka")
    for k, v in cfg.reader_options().items():
        if k != "startingOffsets":
            reader = reader.option(k, v)
    return (
        reader.option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    )
