"""Multimodal-column catalog queries (binary payload plumbing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import _t, query
from flink_etl_spark.operators import multimodal as M


@query(
    "media_metadata",
    """
    WITH media AS (
        SELECT doc_id AS media_id, encode(text) AS payload,
               'text/plain' AS mime
        FROM documents
    )
    SELECT media_id, mime,
           octet_length(payload) AS n_bytes,
           substr(lower(hex(payload)), 1, 16) AS head_hex,
           right(lower(hex(payload)), 8) AS tail_hex
    FROM media
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-only binary triage: byte sizes + hex fingerprint slices of the
    payload column (the cheap pass that runs before any decode)."""
    docs = _t(spark, sf_dir, "documents")
    return M.media_metadata(M.make_media_table(docs))


@query("media_decode_features", None)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode with the deterministic fake codec
    (real codecs absent from this container — SURVEY.md §2.12). Rows-only
    check: the decode output is not SQL-expressible by design."""
    docs = _t(spark, sf_dir, "documents")
    return M.decode_media(M.make_media_table(docs), fake=True)


@query(
    "media_sample_frames",
    """
    WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS n
        FROM documents
    )
    SELECT media_id,
           i AS frame_idx,
           i * 64 AS offset,
           length(substring(text, i * 64 + 1, 64)) AS n_frame_bytes,
           substring(text, i * 64 + 1, 64) AS frame_text
    FROM m, UNNEST(range(0, greatest(CAST(ceil(n / 64.0) AS BIGINT), 1), 2))
            AS u(i)
    """,
)
def media_sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM frame sampling (sequence+explode+binary substring): every
    2nd 64-byte frame of each payload. The payload is utf-8 of ASCII
    text, so the oracle's character substring equals the byte slice."""
    import pyspark.sql.functions as F

    docs = _t(spark, sf_dir, "documents")
    frames = M.sample_frames(M.make_media_table(docs), frame_size=64, stride=2)
    return frames.select(
        "media_id", "frame_idx", "offset", "n_frame_bytes",
        F.decode("frame_bytes", "utf-8").alias("frame_text"),
    )
