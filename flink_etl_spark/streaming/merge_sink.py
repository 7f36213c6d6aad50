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

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from flink_etl_spark.operators.merge import cdc_merge, dedup_latest, overwrite_snapshot


def merge_batch_into_snapshot(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_path: str,
    keys: Sequence[str],
    order_by: Sequence[str] | None = None,
) -> None:
    """One merge step: compact the batch to latest-per-key, full-outer
    merge with the current snapshot (empty on first batch), swap."""
    latest = dedup_latest(batch, keys, order_by=order_by)
    if os.path.exists(snapshot_path):
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
