"""Multimodal-column catalog queries (binary payload plumbing)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import _t, query
from flink_etl_spark.operators import multimodal as M


#: perceptual-hash gate knobs: planted near-dup payloads (one-byte
#: substitution at char 18 of the doc_id % 17 = 3 slice, planted id =
#: doc_id + 1000000 — the synthetic corpus has no organic pairs within
#: Hamming 8, measured) and the pair budget
_PHASH_SLICE = "doc_id % 17 = 3"
_PHASH_PLANT_OFFSET = 1_000_000
_PHASH_MAX_HAMMING = 8
_PHASH_DERIVE = (
    "concat(substr(coalesce(text, ''), 1, 17), 'Q', "
    "substr(coalesce(text, ''), 19))"
)

#: ahash/dhash travel as DECIMAL STRINGS in the gate: the union pads
#: make them nullable, a nullable int64 becomes float64 in pandas, and
#: the engines' int64->float64 conversions disagree beyond 2^53 (Spark
#: via Arrow rounds to nearest, DuckDB's .df() truncates — observed a
#: 4-ulp mismatch on a real corpus hash). Exact decimal text sidesteps
#: the float path entirely.
_MEDIA_PAD_NEW = """
           CAST(NULL AS VARCHAR) AS ahash,
           CAST(NULL AS VARCHAR) AS dhash,
           CAST(NULL AS VARCHAR) AS dcthash,
           CAST(NULL AS BIGINT) AS pair_b,
           CAST(NULL AS BIGINT) AS hamming
"""

_MEDIA_PAD_DECODE = """
           CAST(NULL AS VARCHAR) AS mime,
           CAST(NULL AS BIGINT) AS n_bytes,
           CAST(NULL AS VARCHAR) AS head_hex,
           CAST(NULL AS VARCHAR) AS tail_hex,
           CAST(NULL AS BIGINT) AS width,
           CAST(NULL AS BIGINT) AS height,
           CAST(NULL AS BIGINT) AS f_len,
           CAST(NULL AS DOUBLE) AS f_mean,
           CAST(NULL AS DOUBLE) AS f_var,
           CAST(NULL AS BIGINT) AS f_max,
           CAST(NULL AS BIGINT) AS f_min,
           CAST(NULL AS BIGINT) AS f_first,
           CAST(NULL AS BIGINT) AS f_last,
           CAST(NULL AS BIGINT) AS f_mod
"""


def _phash_oracle_ctes() -> str:
    """DuckDB twin of `media_perceptual_hashes` over the planted
    universe: 64 equal byte spans per payload (ASCII text, so
    ord(char) == byte exactly as the decode arm already relies on),
    integer cross-multiplied mean comparisons, sign-safe 64-bit
    packing (the two-step subtraction — DuckDB BIGINT arithmetic
    errors on overflow, so bit 63 cannot be shifted in directly).
    The DCT twin (pq/pdct/pdh) multiplies the same quantized integer
    span means against the same pinned flattened product kernel the
    operator embeds (`operators.multimodal._DCT_KK`) — all-integer,
    so the engines agree bit-for-bit with no float in sight."""
    from flink_etl_spark.operators.multimodal import (
        _DCT_KK,
        _DCT_MEAN_SCALE,
    )

    kk_flat = "[" + ", ".join(
        str(v) for row in _DCT_KK for v in row
    ) + "]"
    return f"""
    pm AS (
        SELECT doc_id AS media_id, coalesce(text, '') AS txt
        FROM documents
        UNION ALL
        SELECT doc_id + {_PHASH_PLANT_OFFSET}, {_PHASH_DERIVE}
        FROM documents WHERE {_PHASH_SLICE}
    ),
    pn AS (SELECT media_id, txt, length(txt) AS n FROM pm),
    pb AS (
        SELECT media_id, n, i,
               CAST(ord(substr(txt, CAST(i AS INT), 1)) AS BIGINT) AS v
        FROM pn, UNNEST(range(1, n + 1)) AS u(i)
    ),
    pspan AS (
        -- byte (i-1, 0-based) belongs to span j = ((i-1)*64 + 63) // n,
        -- the CONJUGATE of the operator's span ranges
        -- [j*n//64, (j+1)*n//64): the naive (i-1)*64 // n partitions
        -- differently whenever 64 does not divide n (property-checked
        -- for all n in tests)
        SELECT media_id, ((i - 1) * 64 + 63) // n AS j,
               CAST(SUM(v) AS BIGINT) AS s
        FROM pb GROUP BY 1, 2
    ),
    ptot AS (
        SELECT media_id, CAST(coalesce(SUM(v), 0) AS BIGINT) AS t
        FROM pn LEFT JOIN pb USING (media_id) GROUP BY media_id
    ),
    pgrid AS (
        -- the lateral unnest is materialized in a subquery first:
        -- DuckDB rejects a LEFT JOIN whose condition correlates with
        -- an unnest in the same FROM list
        SELECT gg.media_id, gg.n, gg.j,
               coalesce(pspan.s, 0) AS s,
               ((gg.j + 1) * gg.n) // 64 - (gg.j * gg.n) // 64 AS c
        FROM (SELECT media_id, n, j
              FROM pn, UNNEST(range(0, 64)) AS g(j)) gg
        LEFT JOIN pspan
          ON pspan.media_id = gg.media_id AND pspan.j = gg.j
    ),
    pbits AS (
        SELECT pgrid.media_id, j, s, c, n, t,
               (s * n > t * c) AS abit,
               (s * lead(c) OVER w > lead(s) OVER w * c) AS dbit
        FROM pgrid JOIN ptot ON ptot.media_id = pgrid.media_id
        WINDOW w AS (PARTITION BY pgrid.media_id ORDER BY j)
    ),
    ph AS (
        -- both hashes CAST back to BIGINT: DuckDB's SUM(BIGINT)
        -- promotes to HUGEINT, and xor over mixed-sign HUGEINTs
        -- sign-extends to 128 bits, so bit_count would read
        -- true_hamming + 64 and the pairs filter would silently DROP
        -- every mixed-sign near-dup pair the Spark operator emits
        -- (verified: 66 vs 2 on a Hamming-2 mixed-sign pair)
        SELECT media_id,
               CAST(CASE WHEN bool_or(abit AND j = 63)
                    THEN (SUM(CASE WHEN abit AND j < 63
                              THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                              ELSE 0 END) - 9223372036854775807) - 1
                    ELSE SUM(CASE WHEN abit AND j < 63
                             THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                             ELSE 0 END)
               END AS BIGINT) AS ahash,
               CAST(SUM(CASE WHEN coalesce(dbit, FALSE) AND j < 63
                   THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                   ELSE 0 END) AS BIGINT) AS dhash
        FROM pbits GROUP BY media_id
    ),
    pq AS (
        -- quantized integer span means on the same conjugate grid
        SELECT media_id, j,
               CASE WHEN c = 0 THEN 0
                    ELSE (s * {_DCT_MEAN_SCALE}) // c END AS m
        FROM pgrid
    ),
    pdct AS (
        -- 63 AC coefficients per media: flat product kernel indexed
        -- j*63 + b (the operator's _DCT_KK linearization), all int64
        SELECT pq.media_id, bb.b AS b,
               SUM(m * list_extract({kk_flat}, CAST(j * 63 + bb.b + 1 AS INT)))
                 AS coeff
        FROM pq, UNNEST(range(0, 63)) AS bb(b)
        GROUP BY 1, 2
    ),
    pdh AS (
        SELECT media_id,
               CAST(SUM(CASE WHEN coeff > 0
                   THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                   ELSE 0 END) AS BIGINT) AS dcthash
        FROM pdct GROUP BY media_id
    )
    """


@query(
    "media_decode_features",
    f"""
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
        -- mean/var from EXACT integer moments, same IEEE op order as
        -- the decoder (sum/n, ssq/n - mean*mean, floor-to-6): avg()/
        -- var_pop() + round() was a half-edge + accumulation-order
        -- lottery (Python half-even vs DuckDB half-away diverged on
        -- 6 power-of-two-length docs at sf0.1)
        SELECT media_id,
               any_value(n) AS n,
               CAST(sum(v) AS BIGINT) AS total,
               CAST(sum(v) AS DOUBLE) / any_value(n) AS mean,
               CAST(sum(v * v) AS DOUBLE) / any_value(n)
                 - (CAST(sum(v) AS DOUBLE) / any_value(n))
                   * (CAST(sum(v) AS DOUBLE) / any_value(n)) AS var,
               max(v) AS vmax,
               min(v) AS vmin,
               max(CASE WHEN i = 1 THEN v END) AS vfirst,
               max(CASE WHEN i = n THEN v END) AS vlast
        FROM b GROUP BY media_id
    ),
    {_phash_oracle_ctes().strip().lstrip()}
    SELECT 'decode' AS variant,
           m.media_id,
           'text/plain' AS mime,
           m.n AS n_bytes,
           meta.head_hex AS head_hex,
           meta.tail_hex AS tail_hex,
           (m.n % 640) + 1 AS width,
           (m.n % 480) + 1 AS height,
           m.n AS f_len,
           coalesce(floor(a.mean * 1000000.0) / 1000000.0, 0.0) AS f_mean,
           coalesce(floor(a.var * 1000000.0) / 1000000.0, 0.0) AS f_var,
           coalesce(a.vmax, 0) AS f_max,
           coalesce(a.vmin, 0) AS f_min,
           coalesce(a.vfirst, 0) AS f_first,
           coalesce(a.vlast, 0) AS f_last,
           coalesce(a.total, 0) % 997 AS f_mod,
           {_MEDIA_PAD_NEW}
    FROM m
    LEFT JOIN a ON a.media_id = m.media_id
    JOIN meta ON meta.media_id = m.media_id
    UNION ALL
    SELECT 'phash' AS variant,
           ph.media_id,
           {_MEDIA_PAD_DECODE},
           CAST(ahash AS VARCHAR) AS ahash, CAST(dhash AS VARCHAR) AS dhash,
           CAST(dcthash AS VARCHAR) AS dcthash,
           CAST(NULL AS BIGINT) AS pair_b,
           CAST(NULL AS BIGINT) AS hamming
    FROM ph JOIN pdh ON pdh.media_id = ph.media_id
    UNION ALL
    SELECT 'phash_pairs' AS variant,
           x.media_id,
           {_MEDIA_PAD_DECODE},
           CAST(NULL AS VARCHAR) AS ahash,
           CAST(NULL AS VARCHAR) AS dhash,
           CAST(NULL AS VARCHAR) AS dcthash,
           y.media_id AS pair_b,
           bit_count(xor(x.ahash, y.ahash)) AS hamming
    FROM ph x, ph y
    WHERE x.media_id < y.media_id
      AND bit_count(xor(x.ahash, y.ahash)) <= {_PHASH_MAX_HAMMING}
    UNION ALL
    SELECT 'phash_dct_pairs' AS variant,
           x.media_id,
           {_MEDIA_PAD_DECODE},
           CAST(NULL AS VARCHAR) AS ahash,
           CAST(NULL AS VARCHAR) AS dhash,
           CAST(NULL AS VARCHAR) AS dcthash,
           y.media_id AS pair_b,
           bit_count(xor(x.dcthash, y.dcthash)) AS hamming
    FROM pdh x, pdh y
    WHERE x.media_id < y.media_id
      AND bit_count(xor(x.dcthash, y.dcthash)) <= {_PHASH_MAX_HAMMING}
    """,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + perceptual-hash dedup, union-tagged:

    * variant 'decode' — Arrow-batched mapInPandas decode with the
      deterministic fake codec (real codecs absent from this container
      — SURVEY.md §2.12). The fake decode is pure byte math over an
      ASCII payload, so the oracle replicates it with ord()/unnest
      byte aggregation; the 8-dim feature array is SCALARIZED to f_*
      columns so the driver's canonicalizer never sees a list column
      (r1 gate was red on exactly that). head_hex/tail_hex come from
      the JVM-only binary TRIAGE operator (`media_metadata`).
    * variant 'phash' (r12) — aHash/dHash perceptual hashes
      (operators/multimodal.media_perceptual_hashes: 64 byte spans,
      integer cross-multiplied mean bits, sign-safe packing) over the
      corpus PLUS planted one-byte-substituted near-dup payloads
      (`_PHASH_DERIVE` — the synthetic corpus has no organic pairs
      within Hamming {_PHASH_MAX_HAMMING}, measured); every 64-bit
      value gated.
    * variant 'phash_pairs' (r12) — the banded Hamming near-dup join
      (media_phash_near_dups -> dedup.hamming_banded_pairs) over the
      same planted universe vs DuckDB's brute-force XOR-popcount —
      pinning that the pigeonhole candidate generation is EXACT.
    * variants 'phash' dcthash column + 'phash_dct_pairs' (r13) — the
      integer DCT-II perceptual hash (the decorrelated production
      signature; operators/multimodal._DCT_K) fully value-gated: the
      oracle multiplies the same quantized span means against the
      same pinned product kernel, and the DCT pair join is checked
      against brute force exactly like the aHash one.
    """
    docs = _t(spark, sf_dir, "documents")
    media = M.make_media_table(docs)
    meta = M.media_metadata(media).select("media_id", "head_hex", "tail_hex")
    dec = M.decode_media(media, fake=True)
    new_pad = [
        F.lit(None).cast("string").alias("ahash"),
        F.lit(None).cast("string").alias("dhash"),
        F.lit(None).cast("string").alias("dcthash"),
        F.lit(None).cast("long").alias("pair_b"),
        F.lit(None).cast("long").alias("hamming"),
    ]
    decode_pad = [
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("long").alias("n_bytes"),
        F.lit(None).cast("string").alias("head_hex"),
        F.lit(None).cast("string").alias("tail_hex"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("f_len"),
        F.lit(None).cast("double").alias("f_mean"),
        F.lit(None).cast("double").alias("f_var"),
        F.lit(None).cast("long").alias("f_max"),
        F.lit(None).cast("long").alias("f_min"),
        F.lit(None).cast("long").alias("f_first"),
        F.lit(None).cast("long").alias("f_last"),
        F.lit(None).cast("long").alias("f_mod"),
    ]
    decode_arm = dec.join(meta, "media_id").select(
        F.lit("decode").alias("variant"),
        "media_id",
        "mime",
        "n_bytes",
        "head_hex",
        "tail_hex",
        "width",
        "height",
        F.col("features")[0].cast("long").alias("f_len"),
        # features[1]/[2] are already floor-6 canonical in the decoder
        F.col("features")[1].alias("f_mean"),
        F.col("features")[2].alias("f_var"),
        F.col("features")[3].cast("long").alias("f_max"),
        F.col("features")[4].cast("long").alias("f_min"),
        F.col("features")[5].cast("long").alias("f_first"),
        F.col("features")[6].cast("long").alias("f_last"),
        F.col("features")[7].cast("long").alias("f_mod"),
        *new_pad,
    )
    planted = docs.filter(_PHASH_SLICE).select(
        (F.col("doc_id") + F.lit(_PHASH_PLANT_OFFSET)).alias("media_id"),
        F.encode(F.expr(_PHASH_DERIVE), "utf-8").alias("payload"),
    )
    universe = media.select("media_id", "payload").unionByName(planted)
    # ONE materialized signature derivation feeds both arms — the span
    # fold is the expensive no-CSE expression media_phash_near_dups'
    # docstring documents; deriving it per-arm doubles the gate's cost
    # (localCheckpoint, not persist: blocks are ContextCleaner-freed
    # when this gate's result is dropped instead of leaking per call)
    from flink_etl_spark.operators.dedup import hamming_banded_pairs

    sigs = M.media_perceptual_hashes(universe).localCheckpoint(eager=True)
    phash_arm = sigs.select(
        F.lit("phash").alias("variant"),
        "media_id",
        *decode_pad,
        F.col("ahash").cast("string").alias("ahash"),
        F.col("dhash").cast("string").alias("dhash"),
        F.col("dcthash").cast("string").alias("dcthash"),
        F.lit(None).cast("long").alias("pair_b"),
        F.lit(None).cast("long").alias("hamming"),
    )

    def pairs_arm(variant: str, sig_col: str, bits: int) -> DataFrame:
        return hamming_banded_pairs(
            sigs, bits, _PHASH_MAX_HAMMING, id_col="media_id",
            sig_col=sig_col,
        ).withColumnsRenamed({"doc_a": "id_a", "doc_b": "id_b"}).select(
            F.lit(variant).alias("variant"),
            F.col("id_a").alias("media_id"),
            *decode_pad,
            F.lit(None).cast("string").alias("ahash"),
            F.lit(None).cast("string").alias("dhash"),
            F.lit(None).cast("string").alias("dcthash"),
            F.col("id_b").cast("long").alias("pair_b"),
            F.col("hamming").cast("long").alias("hamming"),
        )

    return (
        decode_arm.unionByName(phash_arm)
        .unionByName(pairs_arm("phash_pairs", "ahash", 64))
        .unionByName(pairs_arm("phash_dct_pairs", "dcthash", 63))
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
