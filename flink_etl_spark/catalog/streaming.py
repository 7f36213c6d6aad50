"""Streaming catalog queries: custom stateful operators run to
completion (availableNow) over the testdata, checked against full
DuckDB oracles — a batch SQL engine independently reproduces what the
stateful streaming operator computed incrementally.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import query
from flink_etl_spark.session import apply_runtime_confs
from flink_etl_spark.streaming.stateful import sessionize_stream

_SINK_SEQ = itertools.count()


def _await_drained(q, timeout_s: int = 300) -> None:
    """awaitTermination with the timeout actually CHECKED: a drain that
    outlives `timeout_s` would otherwise leave the query running and
    the caller silently reading a PARTIAL memory sink — a wrong gated
    result with no indication the timeout was the cause."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming drain exceeded {timeout_s}s; stopped the query "
            "instead of returning partial results"
        )


_LAST_SINK: dict[str, str] = {}


def _drain_to_memory(df: DataFrame, tag: str) -> DataFrame:
    """Run a streaming frame to completion (availableNow) into a memory
    sink and return the result table — the one drain recipe every
    streaming gate shares.

    The PREVIOUS invocation's sink view for the same tag is dropped
    first: each memory sink pins its full result set in driver memory
    for process lifetime, so a looped harness (bench iterations,
    repeated gate sweeps) would otherwise grow linearly. The returned
    DataFrame must therefore be consumed before the same gate is
    re-invoked — exactly the driver's call pattern."""
    spark = df.sparkSession
    prev = _LAST_SINK.get(tag)
    if prev is not None:
        spark.catalog.dropTempView(prev)
    name = f"_{tag}_sink_{next(_SINK_SEQ)}"
    # Pin a small stateful parallelism for the drain (r14): every
    # micro-batch spins up one state store PER shuffle partition PER
    # stateful operator side, and at gate scale (sf0.01, ~60k rows)
    # that fixed store setup/commit overhead dominates the wall —
    # measured 20.2 s -> 13.1 s on interval_join_purchase_errors
    # going 32 -> 8. Results are partition-count independent (the T5
    # invariant, tested); this is gate-harness sizing, not operator
    # semantics — production streams keep the session's parallelism.
    # The conf is snapshotted into the query at START, so restoring
    # it immediately after does not disturb the lazily-evaluated
    # batch arms of the same gate.
    key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(key)
    spark.conf.set(key, str(min(int(prev_parts), 8)))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set(key, prev_parts)
    _await_drained(q)
    _LAST_SINK[tag] = name
    return spark.table(name)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of events.parquet with a normalized event-time
    column `ts` (TIMESTAMP, µs precision, session-UTC instants).

    The schema-on-read must match the file's PHYSICAL layout, which has
    shipped in two flavors across driver testdata generations: INT64
    TIMESTAMP(NANOS) (surfaces as a raw LONG under nanosAsLong — the
    same seam sources/tables.py handles for batch) and plain
    TIMESTAMP(MICROS). A hardcoded `ts bigint, … div 1000` schema reads
    a µs file as µs-longs and silently produces 1970-era timestamps —
    every event-time gap compresses 1000×, sessions never close, and
    watermarks sit decades in the past. Probe the batch schema once and
    adapt."""
    from pyspark.sql.types import LongType

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ts_is_long = isinstance(batch_schema["ts"].dataType, LongType)
    ts_ddl = "bigint" if ts_is_long else "timestamp"
    # glob, not a bare file path: FileStreamSource derives basePath from
    # the glob's parent and requires it to be a directory
    raw = spark.readStream.schema(
        f"event_id bigint, ts {ts_ddl}, user_id bigint, event_type string, "
        "value double, props string"
    ).parquet(f"{sf_dir}/events.parque*")
    ts = (
        F.expr("timestamp_micros(ts div 1000)")
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )
    return raw.select(
        "event_id", ts.alias("ts"), "user_id", "event_type", "value", "props"
    )


@query(
    "stream_sessionize_closed",
    """
    WITH s AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM s
    ),
    agg AS (
        SELECT user_id, sid,
               min(ts) AS session_start,
               max(ts) AS session_end,
               count(*) AS n_events,
               round(sum(value), 6) AS total_value
        FROM g GROUP BY 1, 2
    )
    SELECT user_id, epoch_ms(session_start) AS session_start,
           epoch_ms(session_end) AS session_end, n_events, total_value
    FROM agg
    WHERE sid < (SELECT max(sid) FROM agg a2 WHERE a2.user_id = agg.user_id)
    """,
)
def stream_sessionize_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) as a CUSTOM STATEFUL STREAMING
    operator (applyInPandasWithState), drained with availableNow; emits
    every CLOSED session (the open tail session per user stays in
    state). The oracle rebuilds the same sessions in pure SQL — an
    independent batch formulation of the incremental computation."""
    apply_runtime_confs(spark)
    ev = _events_stream(spark, sf_dir).select("user_id", "ts", "value")
    sessions = sessionize_stream(ev, gap_minutes=30)
    # ms-long session bounds in the gate output (same determinism rule
    # as the asof gate): floors identically from us or ns precision
    return _drain_to_memory(sessions, "sessionize").select(
        "user_id",
        F.unix_millis("session_start").alias("session_start"),
        F.unix_millis("session_end").alias("session_end"),
        "n_events",
        "total_value",
    )


@query(
    "stream_hypertable_rollup",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY 1, 2
    -- append-mode rollup emits only FINALIZED buckets: bucket end at or
    -- below the final watermark (max event time - 2h delay)
    HAVING time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
           <= (SELECT max(ts) FROM events) - INTERVAL '2 hours'
    """,
)
def stream_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous rollup gate: the INCREMENTALLY-maintained hourly
    bucket table (append-mode windowed agg + foreachBatch insert of
    finalized buckets, streaming/merge_sink.py) drained with
    availableNow must equal the one-shot SQL aggregation of all events
    restricted to buckets past the final watermark."""
    import shutil

    from flink_etl_spark.catalog import process_workdir
    from flink_etl_spark.operators.merge import snapshot_exists
    from flink_etl_spark.streaming.merge_sink import start_continuous_rollup

    apply_runtime_confs(spark)
    ev = _events_stream(spark, sf_dir).select("ts", "event_type", "value")
    # fresh per invocation WITHIN the cached dir (checkpoint state must
    # not leak between sf_dirs / repeated runs)
    work = f"{process_workdir('rollup')}/{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(work, ignore_errors=True)
    q = start_continuous_rollup(
        ev, f"{work}/rollup", f"{work}/chk", available_now=True
    )
    _await_drained(q)
    if not snapshot_exists(spark, f"{work}/rollup"):
        # no bucket finalized (short event-time span vs the 2h delay):
        # the oracle's HAVING returns 0 rows — match it instead of
        # crashing on a missing path
        return spark.createDataFrame(
            [], "bucket_start timestamp, event_type string, "
            "n_events bigint, sum_value double",
        )
    return spark.read.parquet(f"{work}/rollup")


@query(
    "stream_watermark_dedup",
    """
    SELECT user_id, event_type, count(*) AS n_keys
    FROM (SELECT DISTINCT user_id, event_type FROM events) t
    GROUP BY user_id, event_type
    """,
)
def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with bounded state
    (dropDuplicatesWithinWatermark) drained with availableNow: exactly
    one surviving row per (user_id, event_type). Only the key columns
    are projected — WHICH record survives per key is
    arrival-order-dependent by definition, the key set is not. The
    oracle is batch DISTINCT over the same events.

    The delay is set PAST the corpus's full event-time span on purpose:
    dropDuplicatesWithinWatermark only guarantees dedup of recurrences
    inside the watermark horizon, so "exactly one survivor per key" is
    only a theorem when every recurrence is inside it. A production
    delay (e.g. 1 h — bounded state at unbounded scale) is exercised in
    tests/test_stateful.py; with a short delay here the gate would go
    red the moment the source drained in >1 micro-batch and a key
    recurred beyond the horizon."""
    from flink_etl_spark.streaming.stateful import stream_dedup

    apply_runtime_confs(spark)
    ev = _events_stream(spark, sf_dir).select("user_id", "event_type", "ts")
    deduped = stream_dedup(
        ev, ["user_id", "event_type"], "ts", delay="3650 days"
    )
    return (
        _drain_to_memory(deduped, "wmdedup")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_keys"))
    )
