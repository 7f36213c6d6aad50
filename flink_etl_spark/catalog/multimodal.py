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
