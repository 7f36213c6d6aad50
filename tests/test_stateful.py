"""Stateful streaming operators (streaming/stateful.py): each checked
against an independent batch formulation of the same semantics."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from flink_etl_spark.sources.tables import load_table
from flink_etl_spark.streaming.stateful import (
    cdc_compact_stream,
    sessionize_stream,
    stream_dedup,
)


def _drain(stream_df, name: str, spark, output_mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_sessionize_stream_matches_batch_closed_sessions(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    src = str(tmp_path / "ev")
    events.write.parquet(src)

    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, value double"
    ).parquet(src)
    got = _drain(
        sessionize_stream(stream, gap_minutes=30), "sess_test", spark, "append"
    )
    got_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.total_value, 6))
        for r in got.collect()
    }

    # independent batch formulation: lag-gap cumulative sum -> sessions;
    # the stream only emits CLOSED sessions (a >gap successor exists),
    # so drop each user's final session
    w_u = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        events.withColumn("prev", F.lag("ts").over(w_u))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull())
            | (F.col("ts").cast("long") - F.col("prev").cast("long") > 1800),
        )
        .withColumn("sid", F.sum(F.col("new_sess").cast("int")).over(w_u))
    )
    batch = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    last_sid = batch.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    closed = batch.join(last_sid, "user_id").filter(F.col("sid") < F.col("last_sid"))
    exp_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.total_value, 6))
        for r in closed.collect()
    }
    assert got_rows == exp_rows
    assert len(got_rows) > 50  # non-trivial corpus


def _canal_rows(ids, es_base, n_versions):
    rows = []
    seq = 0
    for v in range(n_versions):
        for i in ids:
            rows.append(
                (i, es_base + v * 1000 + (i % 3), seq, "UPDATE" if v else "INSERT",
                 f"city{i}_v{v}", f"p{i % 5}")
            )
            seq += 1
    return rows


def test_cdc_compact_stream_matches_batch_dedup(spark, tmp_path):
    """Continuous compaction across micro-batches == batch dedup_latest."""
    from flink_etl_spark.operators.merge import dedup_latest

    schema = "id bigint, es bigint, ts bigint, type string, city string, province string"
    b1 = spark.createDataFrame(_canal_rows(range(10), 1_000_000, 2), schema)
    b2 = spark.createDataFrame(
        _canal_rows(range(5, 15), 2_000_000, 1)  # overlap keys 5-9, new 10-14
        + [(3, 500, 99, "UPDATE", "stale", "p0")],  # late/out-of-order: loses
        schema,
    )
    src = str(tmp_path / "cdc")
    # one part-file per batch pins batch composition (multi-part writes
    # split into micro-batches in nondeterministic file order)
    b1.coalesce(1).write.parquet(f"{src}/f1")
    b2.coalesce(1).write.parquet(f"{src}/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    got = _drain(cdc_compact_stream(stream), "cdc_compact_test", spark, "update")
    # update-mode memory sink appends each emission; the LATEST emission
    # per key is the operator's current answer
    w = Window.partitionBy("id").orderBy(F.col("es").desc(), F.col("ts").desc())
    final = (
        got.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    expected = dedup_latest(b1.unionAll(b2), ["id"], order_by=["es", "ts"])
    got_rows = sorted(map(tuple, final.collect()))
    exp_rows = sorted(map(tuple, expected.collect()))
    assert got_rows == exp_rows
    assert len(got_rows) == 15
    # the stale update for id=3 must NOT have won
    assert [r for r in got_rows if r[0] == 3][0][4] == "city3_v1"


def test_stream_dedup_within_watermark(spark, tmp_path):
    recs = [
        {"k": 1, "ts": "2024-01-01T10:00:00", "v": "a"},
        {"k": 1, "ts": "2024-01-01T10:05:00", "v": "dup"},   # same key
        {"k": 2, "ts": "2024-01-01T10:01:00", "v": "b"},
        {"k": 2, "ts": "2024-01-01T10:01:00", "v": "b"},     # exact dup
        {"k": 3, "ts": "2024-01-01T11:30:00", "v": "c"},
    ]
    src = tmp_path / "dups"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(json.dumps(r) for r in recs))

    stream = (
        spark.readStream.schema("k long, ts timestamp, v string")
        .json(str(src))
    )
    got = _drain(
        stream_dedup(stream, ["k"], "ts", delay="1 hour"),
        "dedup_wm_test", spark, "append",
    )
    rows = sorted((r.k, r.v) for r in got.collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_streaming_cdc_end_to_end(spark, tmp_path):
    """The reference's WHOLE system, continuously: Canal JSON stream ->
    parse/filter/explode/flatten (ingest chain) -> stateful latest-per-
    key compaction == the daily batch pipeline (ingest batch + merge)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from flink_etl_spark.operators.canal import ingest_pipeline
    from flink_etl_spark.operators.merge import dedup_latest

    recs = []
    for i in range(30):
        key = i % 7
        recs.append(json.dumps({
            "isDdl": "false" if i % 6 else "true",  # some DDL noise
            "id": key,
            "es": 1704067200000 + i * 1000,
            "ts": i,
            "type": "INSERT" if i < 7 else "UPDATE",
            "data": [{"city": f"c{i}", "province": f"p{key % 3}"}],
        }))
    src = tmp_path / "canal"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(recs[:15]))
    (src / "b.jsonl").write_text("\n".join(recs[15:]))

    raw_stream = (
        spark.readStream.format("text").schema("value string")
        .option("maxFilesPerTrigger", 1).load(str(src))
    )
    flat = ingest_pipeline(raw_stream, ["city", "province"]).drop("dt")
    got_df = _drain(cdc_compact_stream(flat), "cdc_e2e_test", spark, "update")
    w = Window.partitionBy("id").orderBy(F.col("es").desc(), F.col("ts").desc())
    got = sorted(
        map(tuple,
            got_df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").drop("rn").collect())
    )

    raw_batch = spark.read.text(str(src))
    flat_batch = ingest_pipeline(raw_batch, ["city", "province"]).drop("dt")
    expected = sorted(
        map(tuple, dedup_latest(flat_batch, ["id"], order_by=["es", "ts"]).collect())
    )
    assert got == expected
    assert len(got) == 7


def test_sessionize_timeout_flushes_idle_sessions(spark, tmp_path):
    """EventTimeTimeout mode: a user with no later events still gets
    their session emitted once the watermark (driven by OTHER users'
    events in a later batch) passes session_end + gap."""
    from datetime import datetime

    def ts(m):
        return datetime(2024, 1, 1, 10 + m // 60, m % 60)

    schema = "user_id bigint, ts timestamp, value double"
    # batch 1: user 1 has a burst then goes idle; user 2 active
    b1 = spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(5), 2.0), (2, ts(0), 5.0)], schema
    )
    # batch 2: only user 2, far in the future -> watermark advances past
    # user 1's (session_end + gap)
    b2 = spark.createDataFrame([(2, ts(300), 6.0)], schema)
    src = str(tmp_path / "sess_to")
    # one part-file per batch: maxFilesPerTrigger=1 must see b1 as ONE
    # micro-batch (multi-part writes would split it in arbitrary order)
    b1.coalesce(1).write.parquet(f"{src}/f1")
    b2.coalesce(1).write.parquet(f"{src}/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    got = _drain(
        sessionize_stream(stream, gap_minutes=30,
                          timeout_watermark_delay="1 minute"),
        "sess_timeout_test", spark, "append",
    )
    rows = {(r.user_id, r.n_events, round(r.total_value, 6))
            for r in got.collect()}
    # user 1's idle session flushed by timeout: 2 events, 3.0 total.
    # user 2's batch-1 session closed by their own far-future event.
    assert (1, 2, 3.0) in rows
    assert (2, 1, 5.0) in rows


def test_continuous_merge_sink_equals_batch_merge(spark, tmp_path):
    """foreachBatch merge across micro-batches: the rolling snapshot
    after draining equals one batch dedup over all changes."""
    from flink_etl_spark.operators.merge import dedup_latest
    from flink_etl_spark.streaming.merge_sink import start_continuous_merge

    schema = "id bigint, es bigint, ts bigint, type string, city string, province string"
    b1 = spark.createDataFrame(_canal_rows(range(8), 1_000_000, 2), schema)
    b2 = spark.createDataFrame(_canal_rows(range(4, 12), 2_000_000, 1), schema)
    src = str(tmp_path / "chg")
    b1.coalesce(1).write.parquet(f"{src}/f1")
    b2.coalesce(1).write.parquet(f"{src}/f2")

    snap = str(tmp_path / "snapshot")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = start_continuous_merge(
        stream, snap, ["id"], str(tmp_path / "chk"),
        order_by=["es", "ts"], available_now=True,
    )
    q.awaitTermination(180)

    got = sorted(map(tuple, spark.read.parquet(snap).collect()))
    expected = sorted(
        map(tuple, dedup_latest(b1.unionAll(b2), ["id"], order_by=["es", "ts"]).collect())
    )
    assert got == expected
    assert len(got) == 12


def test_continuous_rollup_equals_batch_aggregate(spark, tmp_path):
    """Hypertable rollup (append mode): the incrementally-maintained
    bucket table equals the batch aggregation restricted to FINALIZED
    buckets (bucket end at or below the final watermark)."""
    from flink_etl_spark.streaming.merge_sink import start_continuous_rollup

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    src = str(tmp_path / "ru_ev")
    # split at a MID-BUCKET boundary: the 23:00 bucket of Jan 15 gets
    # events from BOTH batches, accumulated in state before it finalizes
    cut = "2024-01-15 23:30:00"
    events.filter(F.col("ts") < cut).coalesce(1).write.parquet(f"{src}/f1")
    events.filter(F.col("ts") >= cut).coalesce(1).write.parquet(f"{src}/f2")

    rollup = str(tmp_path / "rollup")
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = start_continuous_rollup(
        stream, rollup, str(tmp_path / "ru_chk"), available_now=True
    )
    q.awaitTermination(180)

    got = sorted(map(tuple, spark.read.parquet(rollup).collect()))
    max_ts = events.agg(F.max("ts")).first()[0]
    expected = sorted(
        map(tuple,
            events.groupBy(
                F.window("ts", "1 hour").getField("start").alias("bucket_start"),
                "event_type",
            )
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            # finalized = bucket END <= final watermark (max ts - 2h)
            .filter(
                F.col("bucket_start") + F.expr("INTERVAL 1 HOUR")
                <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
            )
            .collect())
    )
    assert got == expected
    assert len(got) > 100


def test_rollup_watermark_drops_late_and_bounds_state(spark, tmp_path):
    """Regression: grouping must keep the event-time metadata (group by
    the window STRUCT, not .getField) so the watermark finalizes and
    evicts buckets; append mode then makes the late-drop deterministic —
    a far-late event must NOT appear in its long-finalized bucket."""
    from datetime import datetime

    from flink_etl_spark.streaming.merge_sink import start_continuous_rollup

    import time

    schema = "ts timestamp, event_type string, value double"
    b1 = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 10), "click", 1.0),
         (datetime(2024, 1, 1, 10, 0), "click", 100.0)],
        schema,
    )
    # advances the watermark to 08:30 and finalizes bucket 00:00
    b2 = spark.createDataFrame([(datetime(2024, 1, 1, 10, 30), "click", 7.0)], schema)
    # straggler arriving AFTER its bucket was finalized+evicted: must be
    # dropped by the watermark predicate (a straggler in the SAME batch
    # as finalization is still absorbed — engine semantics)
    b3 = spark.createDataFrame([(datetime(2024, 1, 1, 0, 20), "click", 41.0)], schema)
    src = str(tmp_path / "late_ev")
    # distinct mtimes pin the file->batch order under maxFilesPerTrigger
    b1.coalesce(1).write.parquet(f"{src}/f1")
    time.sleep(1.1)
    b2.coalesce(1).write.parquet(f"{src}/f2")
    time.sleep(1.1)
    b3.coalesce(1).write.parquet(f"{src}/f3")

    rollup = str(tmp_path / "late_rollup")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = start_continuous_rollup(
        stream, rollup, str(tmp_path / "late_chk"), available_now=True
    )
    q.awaitTermination(180)
    rows = {
        (r.bucket_start.hour, r.n_events, r.sum_value)
        for r in spark.read.parquet(rollup).collect()
    }
    # bucket 00:00 finalized (batch 2) with ONLY the 00:10 event; the
    # batch-3 straggler was dropped post-eviction. The 10:00 bucket
    # never finalizes (its end exceeds the final watermark), so
    # append-mode emits nothing for it.
    assert rows == {(0, 1, 1.0)}


def test_sessionize_state_survives_restart(spark, tmp_path):
    """The sessionizer's per-key state must persist in the checkpoint
    across query RESTARTS: a session spanning two separately-started
    runs is not split, and a gap across runs closes it correctly."""
    from datetime import datetime

    schema = "user_id bigint, ts timestamp, value double"
    src = tmp_path / "restart_ev"
    src.mkdir()
    sink = str(tmp_path / "restart_out")
    chk = str(tmp_path / "restart_chk")

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            sessionize_stream(stream, gap_minutes=30)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: user 1 opens a session (2 events, 10 min apart)
    spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), 1.0),
         (1, datetime(2024, 1, 1, 10, 10), 2.0)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run()

    # run 2 (fresh query, same checkpoint): +20 min -> SAME session
    # continues; then a 2h-later event closes it
    spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 30), 4.0),
         (1, datetime(2024, 1, 1, 12, 40), 8.0)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run()

    rows = [
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(sink).collect()
    ]
    # exactly ONE closed session: 10:00-10:30 with all 3 events (state
    # carried the open session across the restart); the 12:40 session
    # is still open in state
    assert rows == [
        (1, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 30), 3, 7.0)
    ]


def test_cdc_compact_stream_null_es_does_not_crash(spark, tmp_path):
    """A record with null es/ts (missing Canal envelope field) must not
    TypeError inside the state function; null recency loses to any real
    timestamp (NULLS-LAST-under-DESC, matching batch dedup_latest)."""
    schema = (
        "id bigint, es bigint, ts bigint, type string, city string, province string"
    )
    rows = [
        (1, None, None, "INSERT", "first", "p"),
        (1, 2_000_000, 5, "UPDATE", "real", "p"),
        (2, None, 7, "INSERT", "only_null_es", "p"),
    ]
    src = str(tmp_path / "cdcnull")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    got = _drain(cdc_compact_stream(stream), "cdc_null_es", spark, "update")
    latest = {r.id: r.city for r in got.collect()}
    assert latest == {1: "real", 2: "only_null_es"}


def test_stream_interval_join_inner_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the batch
    interval_join over identical inputs, including matches that span
    micro-batch boundaries (maxFilesPerTrigger=1 over several files:
    a purchase in one batch must still join errors buffered from an
    earlier batch and vice versa)."""
    from flink_etl_spark.operators.joins import interval_join
    from flink_etl_spark.streaming.joins import stream_interval_join

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    src = str(tmp_path / "ev")
    # several files -> several micro-batches under maxFilesPerTrigger=1
    ev.repartition(4).write.parquet(src)

    def split(df):
        p = df.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        e = df.filter(F.col("event_type") == "error").select(
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"), F.col("value").alias("err_value"),
        )
        return p, e

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    sp, se = split(stream)
    se = se.withColumnRenamed("err_user", "user_id")
    got = _drain(
        stream_interval_join(
            sp, se, on=["user_id"], left_ts="purchase_ts",
            right_ts="err_ts", lower="1 HOUR", upper="0 SECONDS",
            watermark_delay="3650 days",
        ),
        "sij_inner", spark, "append",
    )
    got_rows = sorted(
        (r.purchase_id, r.user_id, r.err_ts, round(r.err_value, 6))
        for r in got.collect()
    )

    bp, be = split(ev)
    be = be.withColumnRenamed("err_user", "user_id")
    want = sorted(
        (r.purchase_id, r.user_id, r.err_ts, round(r.err_value, 6))
        for r in interval_join(
            bp, be, on=["user_id"], left_ts="purchase_ts",
            right_ts="err_ts", lower="1 HOUR", upper="0 SECONDS",
        ).filter(F.col("err_ts").isNotNull()).collect()
    )
    assert got_rows == want and len(want) > 20


def test_stream_interval_join_left_outer_watermark_gates_outer_rows(
    spark, tmp_path
):
    """left_outer: null-padded rows emit only once the watermark proves
    no match can arrive. A drained run with delay shorter than the
    stream's span emits the outer row for an OLD unmatched left but
    withholds one near the stream's end."""
    from flink_etl_spark.streaming.joins import stream_interval_join

    rows = [
        # old unmatched purchase: outer row must emit
        (1, "2024-01-01 00:00:00", 10, "purchase", 0.0),
        # matched purchase + its error
        (2, "2024-01-05 12:00:00", 20, "purchase", 0.0),
        (3, "2024-01-05 11:30:00", 20, "error", 5.0),
        # unmatched purchase INSIDE the final watermark horizon: withheld
        (4, "2024-01-10 00:00:00", 30, "purchase", 0.0),
        # max-ts row driving the final watermark to 2024-01-09 00:00:00
        (5, "2024-01-10 00:00:00", 99, "click", 0.0),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, v) for i, ts, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value")
    src = str(tmp_path / "small")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    ).parquet(src)
    p = stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    e = stream.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("err_ts"), F.col("value").alias("err_value"),
    )
    got = _drain(
        stream_interval_join(
            p, e, on=["user_id"], left_ts="purchase_ts", right_ts="err_ts",
            lower="1 HOUR", upper="0 SECONDS",
            watermark_delay="24 hours", join_type="left_outer",
        ),
        "sij_outer", spark, "append",
    )
    by_purchase = {r.purchase_id: r for r in got.collect()}
    assert 1 in by_purchase and by_purchase[1].err_ts is None  # emitted outer
    assert 2 in by_purchase and by_purchase[2].err_value == 5.0  # inner match
    assert 4 not in by_purchase  # withheld: watermark has not passed its band


def test_stream_interval_join_same_named_ts_columns(spark, tmp_path):
    """Both sides carrying the event-time column under the SAME name
    ('ts') must work — the band condition uses DataFrame-qualified
    refs, matching the batch interval_join's contract."""
    from flink_etl_spark.streaming.joins import stream_interval_join

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "purchase"),
         (2, "2024-01-01 09:30:00", 7, "error")],
        "event_id long, ts string, user_id long, event_type string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "event_type")
    src = str(tmp_path / "same_ts")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).parquet(src)
    p = stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    e = stream.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    got = _drain(
        stream_interval_join(
            p, e, on=["user_id"], left_ts="ts", right_ts="ts",
            lower="1 HOUR", upper="0 SECONDS", watermark_delay="30 days",
        ).select("purchase_id", "error_id"),
        "sij_same_ts", spark, "append",
    ).collect()
    assert [(r.purchase_id, r.error_id) for r in got] == [(1, 2)]


def test_sessionize_late_cross_batch_event_does_not_regress_session(
    spark, tmp_path
):
    """A late event in a LATER micro-batch (cross-batch disorder —
    per-batch sorting cannot fix it) must merge into the open session
    without regressing its bounds. The old fold set last=t, moving
    session_end backward past counted events, so the next event's gap
    check closed the session early."""
    import os
    import time

    schema = "user_id bigint, ts timestamp, value double"
    src = tmp_path / "late"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(rows, "user_id long, ts string, value double")
        df = df.select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                       "value")
        df.coalesce(1).write.parquet(str(tmp_path / f"_stage_{name}"))
        part = [p for p in os.listdir(tmp_path / f"_stage_{name}")
                if p.endswith(".parquet")][0]
        os.rename(tmp_path / f"_stage_{name}" / part, src / f"{name}.parquet")

    # batch 1: 10:00, 10:20 (one open session, 30-min gap)
    write_file("b1", [(1, "2024-01-01 10:00:00", 1.0),
                      (1, "2024-01-01 10:20:00", 1.0)])
    time.sleep(1.1)  # distinct mtimes pin file->batch order
    # batch 2: LATE 10:05 (old fold regressed last to 10:05, so the
    # next event's 35-min gap vs 10:05 closed the session early), then
    # 10:40 (20 min after the true last 10:20 — same session), then
    # 11:30 (50-min gap — closes it; the 11:30 tail stays open)
    write_file("b2", [(1, "2024-01-01 10:05:00", 1.0),
                      (1, "2024-01-01 10:40:00", 1.0),
                      (1, "2024-01-01 11:30:00", 1.0)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = _drain(
        sessionize_stream(stream, gap_minutes=30), "late_sess", spark, "append"
    ).collect()
    assert len(got) == 1
    (s,) = got
    assert s.n_events == 4
    assert s.session_start.strftime("%H:%M") == "10:00"
    assert s.session_end.strftime("%H:%M") == "10:40"


def test_continuous_merge_keeps_newer_row_against_late_batch(spark, tmp_path):
    """An out-of-order OLDER record arriving in a later micro-batch
    must not overwrite the newer snapshot row (multi-partition Kafka
    routinely delivers cross-partition disorder)."""
    import os
    import time

    from flink_etl_spark.streaming.merge_sink import start_continuous_merge

    schema = "id bigint, es bigint, ts bigint, city string"
    src = tmp_path / "cdc"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.parquet(str(tmp_path / f"_stage_{name}"))
        part = [p for p in os.listdir(tmp_path / f"_stage_{name}")
                if p.endswith(".parquet")][0]
        os.rename(tmp_path / f"_stage_{name}" / part, src / f"{name}.parquet")

    write_file("b1", [(3, 1_000_000, 1, "new")])
    time.sleep(1.1)
    write_file("b2", [(3, 500, 1, "stale"), (4, 600, 1, "other")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    snap = str(tmp_path / "snap")
    q = start_continuous_merge(
        stream, snap, keys=["id"], order_by=["es", "ts"],
        checkpoint_location=str(tmp_path / "chk"), available_now=True,
    )
    assert q.awaitTermination(180)
    got = {r.id: r.city for r in spark.read.parquet(snap).collect()}
    assert got == {3: "new", 4: "other"}


@pytest.mark.slow
def test_rollup_partition_col_rewrites_only_touched_partitions(
    spark, tmp_path
):
    """partition_col mode: day-partitioned rollup where a micro-batch
    touching only day 2 leaves day 1's files byte-identical on disk,
    and the final contents equal the flat (full-swap) mode."""
    import os
    import time

    from flink_etl_spark.streaming.merge_sink import start_continuous_rollup

    schema = "ts timestamp, event_type string, value double"
    src = tmp_path / "ev"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(rows, "ts string, event_type string, value double")
        df = df.select(F.col("ts").cast("timestamp").alias("ts"),
                       "event_type", "value")
        df.coalesce(1).write.parquet(str(tmp_path / f"_stage_{name}"))
        part = [p for p in os.listdir(tmp_path / f"_stage_{name}")
                if p.endswith(".parquet")][0]
        os.rename(tmp_path / f"_stage_{name}" / part, src / f"{name}.parquet")

    # day-1 buckets finalize once the watermark (max ts - 1h) passes
    # their end; the 23:00 row drives the watermark
    write_file("b1", [("2024-01-01 10:10:00", "click", 1.0),
                      ("2024-01-01 10:20:00", "click", 2.0),
                      ("2024-01-01 23:00:00", "view", 1.0)])
    time.sleep(1.1)
    write_file("b2", [("2024-01-02 08:10:00", "click", 5.0),
                      ("2024-01-02 23:00:00", "view", 1.0)])

    def run(partition_col, out_name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = str(tmp_path / out_name)
        q = start_continuous_rollup(
            stream, out, str(tmp_path / f"chk_{out_name}"),
            watermark_delay="1 hour", available_now=True,
            partition_col=partition_col,
        )
        assert q.awaitTermination(180)
        return out

    flat = run(None, "flat")
    part = run("dt", "part")

    cols = ["bucket_start", "event_type", "n_events", "sum_value"]
    a = sorted(map(tuple, spark.read.parquet(flat).select(*cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(part).select(*cols).collect()))
    assert a == b and len(a) >= 2

    # day-1 files must predate the day-2 batch's write: capture mtimes
    # and re-run a THIRD batch touching only day 2, then compare
    day1 = os.path.join(part, "dt=2024-01-01")
    before = {f: os.path.getmtime(os.path.join(day1, f))
              for f in os.listdir(day1) if f.endswith(".parquet")}
    # day-3 events: above the checkpointed watermark (day-2 23:00 - 1h)
    time.sleep(1.1)
    write_file("b3", [("2024-01-03 09:30:00", "click", 7.0),
                      ("2024-01-03 23:00:00", "view", 1.0)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = start_continuous_rollup(
        stream, part, str(tmp_path / "chk_part"),
        watermark_delay="1 hour", available_now=True, partition_col="dt",
    )
    assert q.awaitTermination(180)
    after = {f: os.path.getmtime(os.path.join(day1, f))
             for f in os.listdir(day1) if f.endswith(".parquet")}
    assert before == after, "untouched day-1 partition was rewritten"
    # and the new day-3 bucket landed
    got = spark.read.parquet(part).filter(
        F.col("bucket_start") == "2024-01-03 09:00:00"
    ).collect()
    assert len(got) == 1 and got[0].sum_value == 7.0


@pytest.mark.slow
def test_rollup_partitioned_fallback_past_touched_cap(spark, tmp_path):
    """A micro-batch finalizing buckets across MORE partitions than
    max_touched_partitions must fall back to one root-level partitioned
    swap (the driver's distinct-value fetch stays bounded) and still
    produce the identical contents the flat full-swap mode computes,
    with the `dt=` layout intact; a later small batch then resumes the
    normal per-partition upsert path against the fallback's output."""
    import os
    import time

    from flink_etl_spark.streaming.merge_sink import start_continuous_rollup

    schema = "ts timestamp, event_type string, value double"
    src = tmp_path / "ev"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows, "ts string, event_type string, value double"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
        df.coalesce(1).write.parquet(str(tmp_path / f"_stage_{name}"))
        part = [p for p in os.listdir(tmp_path / f"_stage_{name}")
                if p.endswith(".parquet")][0]
        os.rename(tmp_path / f"_stage_{name}" / part, src / f"{name}.parquet")

    # ONE file spanning 4 days: the batch that finalizes them touches 4
    # dt partitions — past the cap of 2
    days = [
        (f"2024-01-0{d} 10:10:00", "click", float(d)) for d in range(1, 5)
    ] + [(f"2024-01-0{d} 23:00:00", "view", 1.0) for d in range(1, 5)]
    write_file("b1", days)
    time.sleep(1.1)
    # sentinel file advances the watermark past every day-4 bucket
    write_file("b2", [("2024-01-05 12:00:00", "view", 1.0)])

    def run(partition_col, out_name, cap):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = str(tmp_path / out_name)
        q = start_continuous_rollup(
            stream, out, str(tmp_path / f"chk_{out_name}"),
            watermark_delay="1 hour", available_now=True,
            partition_col=partition_col, max_touched_partitions=cap,
        )
        assert q.awaitTermination(180)
        return out

    flat = run(None, "flat", 1000)
    part = run("dt", "part", 2)

    cols = ["bucket_start", "event_type", "n_events", "sum_value"]
    a = sorted(map(tuple, spark.read.parquet(flat).select(*cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(part).select(*cols).collect()))
    assert a == b and len(a) >= 6
    # the fallback preserved the partitioned layout
    dt_dirs = {d for d in os.listdir(part) if d.startswith("dt=")}
    assert {"dt=2024-01-01", "dt=2024-01-02", "dt=2024-01-03"} <= dt_dirs
    # and no staged DATA survived — the per-partition swap leaves an
    # empty (reader-invisible) _staging/ parent dir behind, which is
    # fine; staged partition copies inside it are not
    if "_staging" in os.listdir(part):
        assert os.listdir(os.path.join(part, "_staging")) == []
    if "_staging" in os.listdir(tmp_path):
        assert os.listdir(tmp_path / "_staging") == []

    # a later small batch (1 partition <= cap) upserts per-partition
    # against the fallback-written layout
    time.sleep(1.1)
    write_file("b3", [("2024-01-06 09:30:00", "click", 7.0),
                      ("2024-01-06 23:00:00", "view", 1.0)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = start_continuous_rollup(
        stream, part, str(tmp_path / "chk_part"),
        watermark_delay="1 hour", available_now=True,
        partition_col="dt", max_touched_partitions=2,
    )
    assert q.awaitTermination(180)
    got = spark.read.parquet(part).filter(
        F.col("bucket_start") == "2024-01-06 09:00:00"
    ).collect()
    assert len(got) == 1 and got[0].sum_value == 7.0


def test_continuous_merge_same_recency_correction_batch_wins(spark, tmp_path):
    """A correction with the SAME recency keys as the snapshot row
    (routine: Canal `es` is second-resolution) must win
    DETERMINISTICALLY — without the explicit batch-wins tie-break,
    row_number over equal order keys picks an arbitrary winner and
    replays could flip the snapshot."""
    from flink_etl_spark.streaming.merge_sink import merge_batch_into_snapshot

    schema = "id bigint, es bigint, ts bigint, city string"
    snap = str(tmp_path / "snap")

    b1 = spark.createDataFrame([(1, 100, 5, "A"), (2, 100, 5, "x")], schema)
    merge_batch_into_snapshot(spark, b1, snap, keys=["id"], order_by=["es", "ts"])
    # same (es, ts), corrected value — batch must beat the snapshot row
    b2 = spark.createDataFrame([(1, 100, 5, "B")], schema)
    merge_batch_into_snapshot(spark, b2, snap, keys=["id"], order_by=["es", "ts"])
    got = {r.id: r.city for r in spark.read.parquet(snap).collect()}
    assert got == {1: "B", 2: "x"}
    # replaying the already-merged batch converges (no flip back)
    merge_batch_into_snapshot(spark, b2, snap, keys=["id"], order_by=["es", "ts"])
    got = {r.id: r.city for r in spark.read.parquet(snap).collect()}
    assert got == {1: "B", 2: "x"}
    # _prio is an implementation detail and must not leak into the snapshot
    assert "_prio" not in spark.read.parquet(snap).columns


def test_continuous_merge_within_batch_tie_is_value_deterministic(spark, tmp_path):
    """Two same-key SAME-recency rows inside one batch must compact to
    a winner that is a pure function of row values (remaining columns
    desc), so replays on any partition layout converge."""
    from flink_etl_spark.streaming.merge_sink import merge_batch_into_snapshot

    schema = "id bigint, es bigint, ts bigint, city string"
    snap = str(tmp_path / "snap")
    b = spark.createDataFrame(
        [(1, 100, 5, "alpha"), (1, 100, 5, "zeta")], schema
    ).repartition(4)
    merge_batch_into_snapshot(spark, b, snap, keys=["id"], order_by=["es", "ts"])
    got = {r.id: r.city for r in spark.read.parquet(snap).collect()}
    assert got == {1: "zeta"}  # lexicographically largest value wins
    # replay with a different layout: converges, no flip
    merge_batch_into_snapshot(
        spark, b.repartition(1), snap, keys=["id"], order_by=["es", "ts"]
    )
    got = {r.id: r.city for r in spark.read.parquet(snap).collect()}
    assert got == {1: "zeta"}


def test_merge_batch_rejects_prio_column_and_skips_nested_maps(spark, tmp_path):
    from flink_etl_spark.streaming.merge_sink import (
        _is_orderable,
        merge_batch_into_snapshot,
    )
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    # nested maps are unorderable at any depth
    assert not _is_orderable(MapType(StringType(), StringType()))
    assert not _is_orderable(ArrayType(MapType(StringType(), StringType())))
    assert not _is_orderable(
        StructType([StructField("m", MapType(StringType(), LongType()))])
    )
    assert _is_orderable(ArrayType(LongType()))

    # a batch with an array<map> column merges fine (excluded from the
    # value tie-break instead of crashing Window.orderBy)
    snap = str(tmp_path / "snap_map")
    b = spark.createDataFrame(
        [(1, 100, 1, [{"k": "v"}])],
        "id bigint, es bigint, ts bigint, tags array<map<string,string>>",
    )
    merge_batch_into_snapshot(spark, b, snap, keys=["id"], order_by=["es", "ts"])
    assert spark.read.parquet(snap).count() == 1

    # a real _prio column must be rejected, not clobbered-and-dropped
    bad = spark.createDataFrame([(1, 100, 1, 9)],
                                "id bigint, es bigint, ts bigint, _prio int")
    with pytest.raises(ValueError, match="_prio"):
        merge_batch_into_snapshot(
            spark, bad, str(tmp_path / "s2"), keys=["id"], order_by=["es", "ts"]
        )


@pytest.mark.slow
def test_rollup_partitioned_upsert_recovers_half_swapped_partition(spark, tmp_path):
    """The partitioned rollup writes each touched partition through the
    recoverable staged swap: a crash that left a partition staged but
    not promoted must be healed by the next batch's recover pass, never
    silently merged-over as 'no existing rows'."""
    import os
    import shutil

    from flink_etl_spark.streaming.merge_sink import start_continuous_rollup

    src = tmp_path / "events"
    src.mkdir()
    schema = "ts timestamp, user_id bigint, value double"

    def write_file(name, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.parquet(str(tmp_path / f"_st_{name}"))
        part = [p for p in os.listdir(tmp_path / f"_st_{name}")
                if p.endswith(".parquet")][0]
        os.rename(tmp_path / f"_st_{name}" / part, src / f"{name}.parquet")

    from datetime import datetime

    write_file("b1", [(datetime(2024, 1, 1, 0, 0), 1, 1.0),
                      (datetime(2024, 1, 1, 23, 59), 1, 1.0),
                      (datetime(2024, 1, 3, 12, 0), 1, 1.0)])
    rollup = str(tmp_path / "rollup")
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = start_continuous_rollup(
        stream, rollup, bucket="1 hour", dims=["user_id"],
        checkpoint_location=str(tmp_path / "chk"),
        watermark_delay="0 seconds", available_now=True,
        partition_col="dt",
    )
    assert q.awaitTermination(180)
    before = spark.read.parquet(rollup).count()
    assert before >= 1

    # simulate a crash mid-swap on the 2024-01-01 partition: data moved
    # to staging, final dir deleted (the delete-then-rename window)
    part = f"{rollup}/dt=2024-01-01"
    staging = f"{rollup}/_staging/dt=2024-01-01"
    os.makedirs(os.path.dirname(staging), exist_ok=True)
    shutil.move(part, staging)
    assert not os.path.exists(part)

    # a later batch touching the same day must first RECOVER the
    # staged partition, then merge against it
    write_file("b2", [(datetime(2024, 1, 1, 5, 0), 2, 2.0),
                      (datetime(2024, 1, 4, 12, 0), 1, 1.0)])
    q = start_continuous_rollup(
        spark.readStream.schema(schema).parquet(str(src)),
        rollup, bucket="1 hour", dims=["user_id"],
        checkpoint_location=str(tmp_path / "chk"),
        watermark_delay="0 seconds", available_now=True,
        partition_col="dt",
    )
    assert q.awaitTermination(180)
    got = spark.read.parquet(rollup)
    day1 = got.filter("dt = '2024-01-01'")
    # the pre-crash day-1 buckets survived the recovery
    assert day1.filter("user_id = 1").count() >= 1


def test_sessionize_null_ts_and_null_value_rows(spark, tmp_path):
    """NULL event times are dropped (they carry no session info and
    would corrupt state via NaT -> INT64_MIN); NULL values contribute 0
    to total_value while still counting the event — SQL sum/count(*)
    semantics, matching the batch oracle."""
    import os

    from flink_etl_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "ev"
    src.mkdir()
    schema = "user_id bigint, ts timestamp, value double"
    from datetime import datetime

    rows = [
        (1, None, 99.0),                          # dropped
        (1, datetime(2024, 1, 1, 0, 0), 1.5),
        (1, datetime(2024, 1, 1, 0, 10), None),   # counts, adds 0
        (1, datetime(2024, 1, 1, 2, 0), 2.0),     # closes session 1
    ]
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.parquet(str(tmp_path / "_st"))
    part = [p for p in os.listdir(tmp_path / "_st") if p.endswith(".parquet")][0]
    os.rename(tmp_path / "_st" / part, src / "b.parquet")

    stream = spark.readStream.schema(schema).parquet(str(src))
    sess = sessionize_stream(stream, gap_minutes=30)
    q = (
        sess.writeStream.format("memory")
        .queryName("null_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    out = spark.sql("SELECT * FROM null_sess").collect()
    assert len(out) == 1  # only session 1 closed
    r = out[0]
    assert r["n_events"] == 2          # null-value row counted
    assert r["total_value"] == 1.5     # null contributed 0, not NaN
    assert r["session_start"] is not None
