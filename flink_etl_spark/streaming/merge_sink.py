"""Continuous CDC merge sink: the reference's DAILY batch merge
(README.md:221-253) run INSIDE the stream via foreachBatch — every
micro-batch folds its changes into a queryable parquet snapshot.

This is the third point on the latency spectrum the engine covers:

| mode | where | freshness | state |
|---|---|---|---|
| daily batch merge | operators/merge.py | 1 day | none |
| foreachBatch merge (this) | per micro-batch | seconds-minutes | the snapshot itself |
| in-operator compaction | stateful.cdc_compact_stream | per record group | per-key store |

Scale design: each micro-batch costs one latest-per-key compaction of
the BATCH (small) plus one full-outer merge against the snapshot —
i.e. the snapshot is rewritten per batch. That is the right trade only
when batches are a meaningful fraction of the snapshot or the snapshot
is partition-prunable (merge only touched dt partitions, which dynamic
partition overwrite gives for free when `partition_col` is set). For
per-key point updates at scale, use cdc_compact_stream (update-mode
state) or a table format with MERGE support.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from flink_etl_spark.operators.merge import (
    cdc_merge,
    dedup_latest,
    overwrite_snapshot,
    recover_snapshot,
    snapshot_exists,
)


def merge_batch_into_snapshot(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_path: str,
    keys: Sequence[str],
    order_by: Sequence[str] | None = None,
) -> None:
    """One merge step: compact the batch to latest-per-key, full-outer
    merge with the current snapshot (empty on first batch), swap.
    Recovers a half-swapped snapshot first, so a foreachBatch replay
    after a crash converges instead of resetting to the batch's keys."""
    recover_snapshot(snapshot_path, spark)
    latest = dedup_latest(batch, keys, order_by=order_by)
    # Hadoop-FS check, not os.path.exists: snapshot_path may be hdfs:/s3a:
    if snapshot_exists(spark, snapshot_path):
        snapshot = spark.read.parquet(snapshot_path)
        merged = cdc_merge(snapshot, latest, keys)
    else:
        merged = latest
    overwrite_snapshot(merged, snapshot_path)


def start_continuous_merge(
    changes: DataFrame,
    snapshot_path: str,
    keys: Sequence[str],
    checkpoint_location: str,
    order_by: Sequence[str] | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Attach the merge as a foreachBatch sink on a change stream.

    Exactly-once effect: foreachBatch re-delivers a batch after a crash
    mid-swap, and the merge is idempotent (re-merging the same changes
    yields the same snapshot), so replays converge."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_batch_into_snapshot(
            batch.sparkSession, batch, snapshot_path, keys, order_by
        )

    writer = (
        changes.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_continuous_rollup(
    events: DataFrame,
    rollup_path: str,
    checkpoint_location: str,
    ts_col: str = "ts",
    bucket: str = "1 hour",
    dims: Sequence[str] = ("event_type",),
    value_col: str = "value",
    watermark_delay: str = "2 hours",
    available_now: bool = False,
) -> StreamingQuery:
    """Hypertable-style CONTINUOUS ROLLUP: a time-bucketed aggregate
    table maintained incrementally from the event stream (the public
    TimescaleDB continuous-aggregate concept re-expressed on Structured
    Streaming).

    The windowed aggregation runs in APPEND mode: a (bucket, dims) row
    is emitted EXACTLY ONCE, when the watermark passes the bucket end —
    final, never revised. Late events inside the watermark are absorbed
    before finalization; later ones are deterministically dropped
    (update mode was rejected: its late-drop is lazy, so a straggler
    arriving after state eviction would re-create a bucket with partial
    counts and the upsert would overwrite the final row). The price is
    freshness: the open tail buckets (within watermark_delay of the max
    event time) are not yet visible in the rollup.

    Reading the rollup is a plain parquet scan — queries over
    pre-aggregated buckets never touch raw events."""
    import pyspark.sql.functions as F

    keys = ["bucket_start", *dims]
    # group by the window STRUCT and project .start afterwards:
    # extracting the field inside the groupBy strips the event-time
    # metadata, so the watermark would never evict state or drop late
    # rows (verified — watermark_delay becomes a no-op and state grows
    # forever)
    agg = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), bucket), *dims)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            *dims,
            "n_events",
            "sum_value",
        )
    )

    def _upsert(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        recover_snapshot(rollup_path, spark)
        if snapshot_exists(spark, rollup_path):
            current = spark.read.parquet(rollup_path)
            merged = cdc_merge(current, batch, keys)
        else:
            merged = batch
        overwrite_snapshot(merged, rollup_path)

    writer = (
        agg.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
