"""Multimodal-column catalog queries (binary payload plumbing)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import _t, query
from flink_etl_spark.operators import multimodal as M


@query(
    "media_decode_features",
    """
    WITH m AS (
        -- coalesce: the decoder treats a NULL payload as empty, and an
        -- empty/NULL doc must still emit its zero-feature row (the b
        -- CTE has no rows for it, hence the LEFT JOIN + coalesces below)
        SELECT doc_id AS media_id, text, coalesce(length(text), 0) AS n
        FROM documents
    ),
    meta AS (
        SELECT doc_id AS media_id,
               substr(lower(hex(encode(text))), 1, 16) AS head_hex,
               right(lower(hex(encode(text))), 8) AS tail_hex
        FROM documents
    ),
    b AS (
        SELECT media_id, n, i, CAST(ord(substr(text, i, 1)) AS BIGINT) AS v
        FROM m, UNNEST(range(1, n + 1)) AS u(i)
    ),
    a AS (
        SELECT media_id,
               any_value(n) AS n,
               CAST(sum(v) AS BIGINT) AS total,
               avg(v) AS mean,
               var_pop(v) AS var,
               max(v) AS vmax,
               min(v) AS vmin,
               max(CASE WHEN i = 1 THEN v END) AS vfirst,
               max(CASE WHEN i = n THEN v END) AS vlast
        FROM b GROUP BY media_id
    )
    SELECT m.media_id,
           'text/plain' AS mime,
           m.n AS n_bytes,
           meta.head_hex AS head_hex,
           meta.tail_hex AS tail_hex,
           (m.n % 640) + 1 AS width,
           (m.n % 480) + 1 AS height,
           m.n AS f_len,
           coalesce(round(a.mean, 6), 0.0) AS f_mean,
           coalesce(round(a.var, 6), 0.0) AS f_var,
           coalesce(a.vmax, 0) AS f_max,
           coalesce(a.vmin, 0) AS f_min,
           coalesce(a.vfirst, 0) AS f_first,
           coalesce(a.vlast, 0) AS f_last,
           coalesce(a.total, 0) % 997 AS f_mod
    FROM m
    LEFT JOIN a ON a.media_id = m.media_id
    JOIN meta ON meta.media_id = m.media_id
    """,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode with the deterministic fake codec
    (real codecs absent from this container — SURVEY.md §2.12). The fake
    decode is pure byte math over an ASCII payload, so the oracle
    replicates it with ord()/unnest byte aggregation; the 8-dim feature
    array is SCALARIZED to f_* columns so the driver's canonicalizer
    never sees a list column (r1 gate was red on exactly that).

    head_hex/tail_hex come from the JVM-only binary TRIAGE operator
    (`media_metadata` — byte sizes + hex fingerprint slices, the cheap
    pass that runs before any decode; former standalone gate
    `media_metadata`, folded here via a media_id join)."""
    docs = _t(spark, sf_dir, "documents")
    media = M.make_media_table(docs)
    meta = M.media_metadata(media).select("media_id", "head_hex", "tail_hex")
    dec = M.decode_media(media, fake=True)
    return dec.join(meta, "media_id").select(
        "media_id",
        "mime",
        "n_bytes",
        "head_hex",
        "tail_hex",
        "width",
        "height",
        F.col("features")[0].cast("long").alias("f_len"),
        F.round(F.col("features")[1], 6).alias("f_mean"),
        F.round(F.col("features")[2], 6).alias("f_var"),
        F.col("features")[3].cast("long").alias("f_max"),
        F.col("features")[4].cast("long").alias("f_min"),
        F.col("features")[5].cast("long").alias("f_first"),
        F.col("features")[6].cast("long").alias("f_last"),
        F.col("features")[7].cast("long").alias("f_mod"),
    )


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
