"""Kafka source builders (S1, SURVEY.md §2.1).

Thin config-to-options mapping; the streaming entry point lives in
streaming/ingest.py. Batch mode reads a bounded offset range — useful
for replay/backfill jobs (`startingOffsets=earliest` mirrors
HdfsSink.java:54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_etl_spark.config import KafkaSourceConfig

#: The EXACT schema `spark.read(.readStream).format("kafka").load()`
#: produces (public Structured-Streaming Kafka integration contract).
#: Recorded-frame tests build batches with this schema and feed them
#: through `decode_kafka_frames` -> the Canal chain, so every seam of
#: the consumption path except the broker socket itself is executed:
#: no broker runs in this environment, but the frame contract does.
KAFKA_FRAME_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def decode_kafka_frames(frames: DataFrame) -> DataFrame:
    """Kafka frame -> raw JSON string: the one projection between the
    source and the Canal chain (`CAST(value AS STRING)` — the Kafka
    `value` is BINARY; the reference's SimpleStringSchema did the same
    utf-8 decode, HdfsSink.java:52). Shared by the real source readers
    AND the recorded-frame contract tests so both run the identical
    code path."""
    return frames.selectExpr("CAST(value AS STRING) AS value")


def read_batch(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    """Bounded Kafka read (earliest..latest) as raw strings."""
    reader = spark.read.format("kafka")
    for k, v in cfg.reader_options().items():
        if k != "startingOffsets":
            reader = reader.option(k, v)
    return decode_kafka_frames(
        reader.option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )
