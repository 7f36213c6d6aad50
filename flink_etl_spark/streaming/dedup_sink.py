"""Continuous substring dedup: scrub each micro-batch of documents
against the accreting anchor-key index INSIDE the stream — the
streaming face of `operators/prep.substring_dedup_incremental`, wired
for foreachBatch replay the way `streaming/merge_sink.py` wires the
CDC merge.

| surface | cadence | dedup horizon |
|---|---|---|
| `prep.substring_dedup` (batch) | one-shot | whole corpus |
| `prep.substring_dedup_incremental` | per batch job | corpus index, manual staging |
| this sink | per micro-batch | everything ingested before this batch |

Replay safety is the whole design. foreachBatch re-delivers a batch
after a crash, and naively re-scrubbing it against an index that
already contains ITS OWN keys would drop the batch's first
occurrences (the documented `substring_dedup_incremental` caveat).
The index is therefore laid out one partition directory per batch —
``<index_path>/batch_id=N/`` — and batch N scrubs against strictly
EARLIER partitions only (``batch_id < N``, partition-pruned), so a
replayed batch sees exactly the index state its first run saw. Both
writes (deduped output to ``<output_path>/batch_id=N``, keys to the
index partition) are per-batch-directory overwrites, hence
idempotent; crash at any point replays to the identical state.

Reference parity: extends the reference's streaming ingest
(`HdfsSink.java:34-127`, dt-partitioned append) with the dedup the
public training-data methodology (Lee et al. 2022) runs as a separate
batch stage — here it rides the ingest stream itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from flink_etl_spark.operators.prep import (
    _check_substr_meta,
    _substring_scrub,
    _write_substr_meta,
)


def _index_so_far(
    spark: SparkSession, index_path: str, batch_id: int, key: str
) -> DataFrame:
    """The anchor-key index visible to batch `batch_id`: every
    partition with a strictly smaller id. Partition pruning keeps the
    current batch's own directory (a possible earlier attempt of this
    very batch) out of the scan — the replay-safety core. Before any
    batch has staged keys the read fails schema inference; that IS the
    empty index."""
    from pyspark.errors import AnalysisException

    key_type = "string" if key == "digest" else "bigint"
    try:
        # the engine session disables partition-column type inference
        # (RUNTIME_CONFS: dt= partitions are strings), so batch_id
        # arrives as a STRING — the explicit bigint cast is load-
        # bearing: a lexicographic "10" < "9" comparison would corrupt
        # the pruning from batch 10 on
        return (
            spark.read.option("basePath", index_path)
            .parquet(index_path)
            .filter(F.col("batch_id").cast("bigint") < F.lit(batch_id))
            .select("anchor_key")
        )
    except AnalysisException:
        # path absent / only the meta sidecar present: nothing staged
        return spark.createDataFrame([], f"anchor_key {key_type}")


def dedup_batch_step(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    output_path: str,
    min_tokens: int = 50,
    winnow: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "hash64",
    out_col: str = "dedup_text",
    broadcast_batch: bool = True,
) -> None:
    """One foreachBatch step, callable directly for testing/backfill:
    scrub against `batch_id`-earlier index partitions, overwrite the
    batch's output directory, overwrite the batch's index partition
    with its distinct anchor keys. Idempotent by construction —
    calling it twice with the same (batch, batch_id) converges."""
    from flink_etl_spark.operators.prep import (
        _substring_anchors,
        _substring_narrow,
    )

    spark = batch.sparkSession
    params = {"key": key, "min_tokens": min_tokens, "winnow": winnow}
    if not _check_substr_meta(spark, index_path, params):  # raises on drift
        _write_substr_meta(spark, index_path, params)

    index = _index_so_far(spark, index_path, batch_id, key)
    with_anchors = _substring_anchors(
        batch, min_tokens, 1, id_col, text_col, key
    )
    deduped = _substring_scrub(
        with_anchors, index, min_tokens, winnow, id_col, out_col,
        broadcast_batch,
    )
    deduped.write.mode("overwrite").parquet(
        f"{output_path}/batch_id={batch_id}"
    )
    keys = (
        _substring_narrow(with_anchors, id_col, winnow)
        .select(F.col("_k").alias("anchor_key"))
        .distinct()
    )
    keys.write.mode("overwrite").parquet(f"{index_path}/batch_id={batch_id}")


def _list_index_partitions(spark: SparkSession, index_path: str) -> list[int]:
    """Sorted batch ids of the `batch_id=N` partition directories
    currently present under the index root (Hadoop-FS portable)."""
    from flink_etl_spark.operators.merge import _hadoop_fs

    fs, root = _hadoop_fs(spark, index_path)
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            try:
                ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(ids)


def compact_dedup_index(
    spark: SparkSession,
    index_path: str,
    horizon: int | None = None,
    target_files: int | None = None,
) -> int:
    """Fold every index partition with ``batch_id < horizon`` into ONE
    consolidated partition — the maintenance op that keeps the
    continuous-dedup index from accreting a directory per micro-batch
    forever (at a batch per minute, a quarter's run is ~130k
    directories, and `_index_so_far` lists all of them every batch: a
    driver-metadata scale-killer plus the classic small-files
    problem). Returns the number of partition directories folded
    (0 = nothing to do).

    REPLAY INVARIANT (why this is safe): a scrub of batch M reads
    partitions ``batch_id < M``. The consolidated partition gets a
    FRESH NEGATIVE id ``c = min(-1, min_present - 1)`` — always
    ``< M`` for every real batch, and never a directory a replay
    excludes-by-equality — and holds exactly the distinct keys of the
    folded batches, all ``< horizon``. So for every batch
    ``M >= horizon``, {partitions < M} spans the identical key set
    before and after compaction. foreachBatch can only replay the
    LATEST committed batch, hence the default
    ``horizon = max present id``: the one replayable batch still sees
    exactly the index state its first run saw. Pass a lower horizon
    only to keep more history unfolded; NEVER pass one above a batch
    that may still replay.

    Crash safety, step by step: (1) the consolidated write targets a
    never-before-used directory — a crash mid-write leaves ignorable
    `_temporary` junk or a partial key subset that merely DUPLICATES
    still-present originals (every lookup is a semi-join; duplicate
    keys are harmless); (2) originals are deleted only after the
    write commits — a crash mid-delete leaves harmless duplicates;
    (3) a rerun folds the leftovers (including the previous
    consolidated partition, ids strictly decrease) and converges.

    ``target_files``: file count for the consolidated partition;
    default sizes it from the folded input bytes at ~128 MB/file
    (a distinct at default shuffle parallelism would re-create the
    small-files problem this op exists to fix).

    Run between micro-batches (or while the stream is down): a scrub
    that listed a folded directory right before its deletion can hit
    a FileNotFound and retry — the invariant holds on retry, but the
    wasted work is avoidable."""
    parts = _list_index_partitions(spark, index_path)
    if not parts:
        return 0
    if horizon is None:
        horizon = parts[-1]
    folded = [p for p in parts if p < horizon]
    if len(folded) < 2:
        return 0

    from flink_etl_spark.operators.merge import _hadoop_fs

    if target_files is None:
        total = 0
        for p in folded:
            fs, hp = _hadoop_fs(spark, f"{index_path}/batch_id={p}")
            total += fs.getContentSummary(hp).getLength()
        target_files = max(1, -(-total // (128 << 20)))

    consolidated = min(-1, folded[0] - 1)
    (
        spark.read.option("basePath", index_path)
        .parquet(index_path)
        .filter(F.col("batch_id").cast("bigint") < F.lit(horizon))
        .select("anchor_key")
        .distinct()
        .coalesce(target_files)
        .write.mode("overwrite")
        .parquet(f"{index_path}/batch_id={consolidated}")
    )
    for p in folded:
        fs, hp = _hadoop_fs(spark, f"{index_path}/batch_id={p}")
        fs.delete(hp, True)
    return len(folded)


def start_continuous_dedup(
    docs: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_location: str,
    min_tokens: int = 50,
    winnow: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "hash64",
    out_col: str = "dedup_text",
    broadcast_batch: bool = True,
    available_now: bool = False,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Attach continuous substring dedup as a foreachBatch sink on a
    streaming document DataFrame. Output accretes under
    ``<output_path>/batch_id=N`` (read the root with partition
    discovery for the full deduped corpus); the index accretes under
    ``<index_path>/batch_id=N`` and doubles as a
    `substring_dedup_incremental`-compatible key set for offline
    jobs. Parameters are pinned per index by the meta sidecar.

    ``compact_every=N`` runs `compact_dedup_index` INSIDE the sink
    every N-th batch (horizon = the just-committed batch id), bounding
    the index at ~N + 1 partition directories with no external
    scheduler. Safe inside foreachBatch by construction: steps are
    serialized, the horizon preserves the replay invariant, and a
    replayed batch re-runs the compaction as a no-op (fewer than two
    foldable directories remain)."""
    if compact_every is not None and compact_every < 1:
        raise ValueError(
            f"compact_every must be >= 1 or None, got {compact_every}"
        )
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    if not (1 <= winnow <= min_tokens):
        raise ValueError(
            f"winnow must satisfy 1 <= winnow <= min_tokens, got "
            f"winnow={winnow}, min_tokens={min_tokens}"
        )
    if key not in ("hash64", "digest"):
        raise ValueError(f"key must be 'hash64' or 'digest', got {key!r}")

    def _step(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        dedup_batch_step(
            batch, batch_id, index_path, output_path, min_tokens, winnow,
            id_col, text_col, key, out_col, broadcast_batch,
        )
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_dedup_index(
                batch.sparkSession, index_path, horizon=batch_id
            )

    writer = (
        docs.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
