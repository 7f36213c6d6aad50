"""Streaming/batch equivalence for the ingest job (SURVEY.md §5.4):
identical transform chain under readStream must produce the same
partitioned output as the batch run."""

from __future__ import annotations

import json

from flink_etl_spark.config import SinkConfig
from flink_etl_spark.streaming import ingest


def _write_jsonl(path, n=20):
    recs = []
    for i in range(n):
        recs.append(json.dumps({
            "isDdl": "false" if i % 5 else "true",
            "id": i,
            "es": 1704067200000 + i * 43_200_000,  # every 12h -> several dt days
            "ts": i,
            "type": "INSERT",
            "data": [{"city": f"c{i}", "province": f"p{i % 3}"}],
        }))
    path.write_text("\n".join(recs))


def test_stream_equals_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "chunk.jsonl")

    batch_sink = SinkConfig(path=str(tmp_path / "out_batch"),
                            checkpoint_location=str(tmp_path / "chk_b"))
    stream_sink = SinkConfig(path=str(tmp_path / "out_stream"),
                             checkpoint_location=str(tmp_path / "chk_s"))

    raw_batch = spark.read.text(str(src))
    ingest.run_ingest_batch(raw_batch, ["city", "province"], batch_sink)

    raw_stream = spark.readStream.format("text").schema("value string").load(str(src))
    q = ingest.start_ingest(raw_stream, ["city", "province"], stream_sink,
                            available_now=True)
    q.awaitTermination(120)

    b = spark.read.option("basePath", batch_sink.path).parquet(batch_sink.path)
    s = spark.read.option("basePath", stream_sink.path).parquet(stream_sink.path)
    b_rows = sorted(map(tuple, b.select("id", "es", "ts", "type", "city", "province", "dt").collect()))
    s_rows = sorted(map(tuple, s.select("id", "es", "ts", "type", "city", "province", "dt").collect()))
    assert b_rows == s_rows
    assert len(b_rows) == 16  # 4 of 20 records are DDL -> dropped
    # partition layout is dt=yyyyMMdd directories
    dts = {r.dt for r in b.select("dt").distinct().collect()}
    assert all(len(d) == 8 and d.isdigit() for d in dts) and len(dts) > 1


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """Restarting with the same checkpoint must not duplicate output."""
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", n=10)
    sink = SinkConfig(path=str(tmp_path / "out"),
                      checkpoint_location=str(tmp_path / "chk"))

    def run_once():
        raw = spark.readStream.format("text").schema("value string").load(str(src))
        q = ingest.start_ingest(raw, ["city", "province"], sink, available_now=True)
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(sink.path).count()
    # second start over the same checkpoint: no new input -> no new rows
    run_once()
    n2 = spark.read.parquet(sink.path).count()
    assert n1 == n2 == 8  # 2 of 10 are DDL


def test_watermarked_window_agg_stream_equals_batch(spark, tmp_path):
    """Tumbling-window agg with a watermark under readStream must match
    the batch result once the stream drains (availableNow)."""
    import pyspark.sql.functions as F

    from flink_etl_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "events_pq")
    events.write.parquet(src)

    # watermarks require instant TIMESTAMP (not NTZ) — cast both modes
    batch = (
        spark.read.parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").getField("start").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    expected = sorted((r.w, r.n) for r in batch.collect())

    stream = (
        spark.readStream.schema(events.schema).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").getField("start").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.format("memory").queryName("win_agg_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.w, r.n) for r in spark.sql("SELECT * FROM win_agg_test").collect()
    )
    assert got == expected


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Stream-stream inner join with watermarks + event-time range
    condition must equal the batch interval join once drained."""
    import pyspark.sql.functions as F

    from flink_etl_spark.operators.joins import interval_join
    from flink_etl_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    )
    src = str(tmp_path / "ev_ss")
    events.write.parquet(src)
    schema = "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"

    def split(df):
        p = df.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id",
            F.col("ts").alias("pts"),
        )
        c = df.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("cts"),
        )
        return p, c

    sp, sc = split(spark.readStream.schema(schema).parquet(src))
    joined = (
        sp.withWatermark("pts", "2 hours")
        .join(
            sc.withWatermark("cts", "2 hours"),
            F.expr(
                "user_id = c_user_id AND "
                "cts > pts - INTERVAL 1 HOUR AND cts <= pts"
            ),
            "inner",
        )
        .select("purchase_id", "click_id")
    )
    q = (
        joined.writeStream.format("memory").queryName("ss_join_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM ss_join_test").collect())
    )

    bp, bc = split(spark.read.parquet(src))
    batch = interval_join(
        bp, bc.withColumnRenamed("c_user_id", "user_id"),
        on=["user_id"], left_ts="pts", right_ts="cts",
        lower="1 HOUR", upper="0 SECONDS",
    ).filter(F.col("click_id").isNotNull())
    expected = sorted(map(tuple, batch.select("purchase_id", "click_id").collect()))
    assert got == expected
    assert len(got) > 0


def test_stream_static_broadcast_join_equals_batch(spark, tmp_path):
    """Stream-static join: a streaming fact enriched by a static
    dimension (no watermark needed — the static side is just a lookup)
    must equal the batch join."""
    import pyspark.sql.functions as F

    from flink_etl_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    customers = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    src = str(tmp_path / "ev_ss2")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    joined = stream.join(F.broadcast(customers), "user_id").select(
        "event_id", "user_id", "c_mktsegment"
    )
    q = (
        joined.writeStream.format("memory").queryName("ss_static_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM ss_static_test").collect()))

    expected = sorted(
        map(tuple,
            events.join(F.broadcast(customers), "user_id")
            .select("event_id", "user_id", "c_mktsegment").collect())
    )
    assert got == expected
    assert len(got) >= 1000
