"""Recorded-frame Kafka contract tests (S1, SURVEY.md §2.1).

No broker runs in this environment, so the real `format("kafka")`
socket path cannot execute; these tests pin everything else: batches
with the EXACT schema the Kafka source produces (key/value BINARY,
topic, partition, offset, timestamp, timestampType) flow through the
same `decode_kafka_frames` projection the real readers use, then the
full Canal chain — leaving the broker socket as the only untested
seam (reference: HdfsSink.java:47-55, kafkaConfig.conf:1-11)."""

from __future__ import annotations

import json
from datetime import datetime

import pyspark.sql.functions as F

from flink_etl_spark.operators.canal import ingest_pipeline
from flink_etl_spark.sources.kafka import KAFKA_FRAME_SCHEMA, decode_kafka_frames


def _frame(value: dict | str, offset: int, partition: int = 0, key: bytes | None = None):
    """One recorded Kafka frame, as the broker would deliver it."""
    payload = value if isinstance(value, str) else json.dumps(value, separators=(",", ":"))
    return (
        key,
        payload.encode("utf-8"),
        "qfbap_ods.code_city",  # the reference's topic (kafkaConfig.conf:2)
        partition,
        offset,
        datetime(2024, 1, 2, 3, 4, 5),
        0,  # TimestampType.CREATE_TIME
    )


def _canal(id, es, isDdl="false", city="sh"):
    return {
        "isDdl": isDdl, "id": id, "es": es,
        "ts": es + 1 if es is not None else None, "type": "INSERT",
        "data": [{"city": city, "province": "x"}],
    }


def test_recorded_frames_through_full_canal_chain(spark):
    """Binary Kafka values decode and flatten end-to-end; DDL frames and
    a non-JSON frame are dropped; multibyte utf-8 payloads survive the
    BINARY -> STRING cast; frame metadata (offset/partition) does not
    leak into the output."""
    frames = [
        _frame(_canal(1, 1704067200000), offset=0),
        _frame(_canal(2, 1704067200000, isDdl="true"), offset=1),  # DDL
        _frame(_canal(3, 1704153600000, city="北京"), offset=2, partition=1),
        _frame("not json", offset=3, key=b"k3"),
        _frame(_canal(4, None), offset=4),  # null es -> dt sentinel
    ]
    raw = spark.createDataFrame(frames, KAFKA_FRAME_SCHEMA)
    assert [f.name for f in raw.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType",
    ]
    out = ingest_pipeline(
        decode_kafka_frames(raw), payload_cols=["city", "province"]
    )
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 3, 4}
    assert rows[1].dt == "20240101"
    assert rows[3].city == "北京"  # utf-8 round-trip through BINARY
    assert rows[3].dt == "20240102"
    assert rows[4].dt == "00000000"  # EventTimeBucketAssigner.java:25-26
    assert set(out.columns) == {"id", "es", "ts", "type", "city", "province", "dt"}


def test_recorded_frames_streaming_drain_equals_batch(spark, tmp_path):
    """The same recorded frames replayed as a STREAM (parquet file
    source with the Kafka frame schema) through the identical decode +
    chain produce the batch result — micro-batching is invisible."""
    frames = [
        _frame(_canal(i, 1704067200000 + i * 1000), offset=i, partition=i % 3)
        for i in range(20)
    ] + [_frame(_canal(99, 1704067200000, isDdl="true"), offset=99)]
    raw = spark.createDataFrame(frames, KAFKA_FRAME_SCHEMA)
    src = str(tmp_path / "frames")
    raw.write.parquet(src)

    stream = spark.readStream.schema(KAFKA_FRAME_SCHEMA).parquet(src)
    q = (
        ingest_pipeline(decode_kafka_frames(stream), ["city", "province"])
        .writeStream.format("memory")
        .queryName("kafka_contract_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.table("kafka_contract_stream").collect())
    )
    expected = sorted(
        map(
            tuple,
            ingest_pipeline(
                decode_kafka_frames(spark.read.parquet(src)), ["city", "province"]
            ).collect(),
        )
    )
    assert got == expected
    assert len(got) == 20


def test_reader_options_match_reference_contract():
    """The options handed to format('kafka') encode the reference's
    consumer setup: subscribe topic, earliest offsets
    (HdfsSink.java:54), bootstrap servers, group id."""
    from flink_etl_spark.config import KafkaSourceConfig

    cfg = KafkaSourceConfig(
        bootstrap_servers="kms-2:9092,kms-3:9092,kms-4:9092",
        topic="qfbap_ods.code_city",
        group_id="test123",
    )
    opts = cfg.reader_options()
    assert opts["subscribe"] == "qfbap_ods.code_city"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.bootstrap.servers"].count(":9092") == 3
    assert opts["kafka.group.id"] == "test123"


def test_decode_is_binary_safe_noop_on_strings(spark):
    """decode_kafka_frames only projects CAST(value AS STRING): null
    keys/values and empty payloads pass through as nulls/empties rather
    than erroring (a tombstone message must not kill the stream)."""
    frames = [
        (None, None, "t", 0, 0, datetime(2024, 1, 1), 0),  # tombstone
        (None, b"", "t", 0, 1, datetime(2024, 1, 1), 0),
    ]
    raw = spark.createDataFrame(frames, KAFKA_FRAME_SCHEMA)
    vals = [r.value for r in decode_kafka_frames(raw).collect()]
    assert vals == [None, ""]
    # and the full chain simply drops them (malformed/empty JSON)
    assert ingest_pipeline(decode_kafka_frames(raw), ["city"]).count() == 0
