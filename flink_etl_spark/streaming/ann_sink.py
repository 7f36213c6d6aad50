"""Continuous ANN index maintenance: append each micro-batch of
embeddings to a staged PQ / IVF-PQ index INSIDE the stream — the ANN
face of the foreachBatch maintenance pattern
(`streaming/dedup_sink.py` for substring dedup, `streaming/merge_sink`
for CDC): a training-data pipeline that embeds documents continuously
keeps its similarity index current without a nightly rebuild.

The index MUST be built offline first (`pq_build_index` /
`ivfpq_build_index` over a bootstrap corpus): the quantizers are
frozen at build time — that is what keeps staged and appended codes
score-comparable — and the seed recipes need a corpus to derive from.
The sink only ever appends.

Replay safety rides on the append operators' convergence contract:
foreachBatch redelivers the latest batch after a crash, and
`pq_append_index` / `ivfpq_append_index` anti-join already-present ids
before writing, so a replayed batch appends nothing (ids must be
globally unique across the corpus and every batch — the same contract
as `semdedup_incremental`).

Quantizer drift is the operational caveat, as with every frozen-
quantizer incremental in this package: if the embedding distribution
moves away from the build-time centroids/codebooks, recall decays —
rebuild the index periodically (the searches themselves need no
knowledge of the cadence; parameters travel in the meta sidecar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from flink_etl_spark.operators.similarity import (
    _ivfpq_meta,
    _pq_index_meta,
    ivfpq_append_index,
    pq_append_index,
)


def start_continuous_ann_index(
    embs: DataFrame,
    index_path: str,
    checkpoint_location: str,
    kind: str = "ivfpq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = False,
) -> StreamingQuery:
    """Attach continuous index append as a foreachBatch sink on a
    streaming embedding DataFrame. ``kind`` selects the staged layout:
    ``"ivfpq"`` (cell-partitioned byte codes — the 100 TB default) or
    ``"pq"`` (flat codes). The index at `index_path` must already
    exist with a matching meta sidecar; validated once at start so a
    misconfigured stream fails at attach time, not at first batch."""
    if kind not in ("ivfpq", "pq"):
        raise ValueError(f"kind must be 'ivfpq' or 'pq', got {kind!r}")
    spark = embs.sparkSession
    # fail fast: a missing/incompatible index raises HERE, not inside
    # the first micro-batch (where it would poison the checkpoint)
    if kind == "ivfpq":
        if _ivfpq_meta(spark, index_path) is None:
            raise ValueError(
                f"no IVF-PQ index at {index_path} — run ivfpq_build_index "
                "over a bootstrap corpus before attaching the stream"
            )
        append = ivfpq_append_index
    else:
        _pq_index_meta(spark, index_path)  # raises when absent/drifted
        append = pq_append_index

    def _step(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append(
            batch.sparkSession, batch, index_path,
            id_col=id_col, vec_col=vec_col,
        )

    writer = (
        embs.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
