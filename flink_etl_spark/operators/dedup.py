"""Deduplication operators for training-data pipelines.

Five strategies over the `documents` table (extension surface,
SURVEY.md §2.12 — the reference's only dedup is latest-per-key CDC
compaction, operators/merge.py):

* exact            — hash-groupBy on content, keep canonical row
* n-gram Jaccard   — exact set-similarity join via shingle inverted index
* MinHash + LSH    — sketch signatures, band-bucket join for candidates,
                     exact verification of candidates only
* SimHash          — bit-vote fingerprint; identical signatures bucket
* embedding cosine — near-dup pairs above a cosine threshold

Scale design (100 TB):
* every strategy is shuffle-on-key + aggregate — no driver-side state
* the Jaccard inverted-index join is quadratic per posting list; LSH is
  the scale path: candidates per doc ~ band collisions, not corpus size
* `vocab_ids` (dictionary) keeps oracles exact; swap for xxhash64 at
  unbounded vocab (functions/hashing.py docstring)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_etl_spark.functions.hashing import (
    MERSENNE_P,
    MINHASH_COEFFS,
    SIMHASH_COEFFS,
    affine_hash,
    shingles_expr,
    tokens_expr,
    vocab_ids,
)


def exact_dedup(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """Exact dedup: one row per distinct content, keeping the smallest id
    (deterministic canonical choice) plus the duplicate count.

    groupBy(content) is a hash shuffle on the content hash; at scale,
    pre-hash long content to a digest column first so the shuffle keys
    are small (`sha2(content, 256)`)."""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("n_copies"),
    )


def shingle_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 3) -> DataFrame:
    """(doc, shingle) inverted-index postings, distinct per doc."""
    toks = docs.select(
        F.col(id_col), shingles_expr(tokens_expr(text_col), k).alias("shingles")
    )
    return toks.select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    ).distinct()


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: explode shingles, self-join
    the inverted index, count shared shingles per pair, Jaccard =
    |A∩B| / (|A|+|B|-|A∩B|), keep pairs >= threshold.

    The self-join shuffles on the shingle — hot shingles (stopword
    n-grams) are the skew risk; AQE skew-join handles moderate skew, and
    df-frequency pruning (drop shingles appearing in >0.1% of docs)
    is the standard mitigation at corpus scale."""
    sh = shingle_sets(docs, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                 F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = (
        shared.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("na") + F.col("nb") - F.col("shared")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select("doc_a", "doc_b", "jaccard")


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """MinHash sketch: sig[i] = min over shingles of (a_i*sid + b_i) % P.

    Long format (doc, perm_id, minhash) — one narrow shuffle, arbitrary
    n_hashes without wide schemas. `sid` comes from the lexicographic
    vocab dictionary so oracles can reproduce values exactly."""
    sh = shingle_sets(docs, id_col, text_col, k)
    vocab = vocab_ids(sh.select(F.col("shingle").alias("term")), "term")
    with_ids = sh.join(
        vocab, sh.shingle == vocab.term, "inner"
    ).select(F.col(id_col), F.col("term_id"))
    perms = [(i, a, b) for i, (a, b) in enumerate(MINHASH_COEFFS[:n_hashes])]
    perm_df = with_ids.sparkSession.createDataFrame(perms, ["perm_id", "a", "b"])
    crossed = with_ids.join(F.broadcast(perm_df))
    return (
        crossed.withColumn(
            "h",
            (F.col("term_id").cast("long") * F.col("a") + F.col("b"))
            % F.lit(MERSENNE_P),
        )
        .groupBy(id_col, "perm_id")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidates(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature: band_key = concat of the band's minhash
    values; docs sharing any (band_id, band_key) bucket are candidates.
    Returns distinct (doc_a < doc_b) pairs."""
    banded = (
        sigs.withColumn("band_id", (F.col("perm_id") / rows_per_band).cast("int"))
        .filter(F.col("band_id") < bands)
        .groupBy(id_col, "band_id")
        .agg(
            F.concat_ws(
                ":",
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(
                            "=",
                            F.col("perm_id").cast("string"),
                            F.col("minhash").cast("string"),
                        )
                    )
                ),
            ).alias("band_key")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 16,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: sketch -> band-bucket candidates ->
    exact-Jaccard verification of candidates only.

    With 16 hashes / 8 bands / 2 rows, P(candidate) = 1-(1-j^2)^8:
    j=0.8 -> 0.9998 recall; j=0.3 -> 0.5 — the classic S-curve. The
    verification join touches only candidate pairs, so corpus-scale cost
    is bands * corpus (sketching) + bucket collisions (candidates)."""
    sigs = minhash_signatures(docs, n_hashes, id_col, text_col, k)
    cand = lsh_candidates(sigs, bands, n_hashes // bands, id_col)
    exact = jaccard_pairs(docs, threshold, id_col, text_col, k)
    return cand.join(exact, ["doc_a", "doc_b"], "inner").select(
        "doc_a", "doc_b", "jaccard"
    )


def simhash_signatures(
    docs: DataFrame,
    bits: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash: per token occurrence, each bit j votes +-1 by the parity
    of (a_j*tid + b_j) % P; bit j of the signature is 1 iff the vote sum
    is positive. Identical signatures = near-identical token bags."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("token")
    )
    vocab = vocab_ids(toks.select(F.col("token").alias("term")), "term")
    with_ids = toks.join(vocab, toks.token == vocab.term).select(
        F.col(id_col), F.col("term_id")
    )
    bit_votes = [
        F.sum(
            F.when(affine_hash(F.col("term_id"), a, b) % 2 == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j, (a, b) in enumerate(SIMHASH_COEFFS[:bits])
    ]
    votes = with_ids.groupBy(id_col).agg(*bit_votes)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        sig = term if sig is None else (sig + term)
    return votes.select(F.col(id_col), sig.cast("long").alias("simhash"))


def embedding_near_dups(
    embs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup pairs above threshold — brute-force O(n^2) cross
    join, the exactness baseline. The scale path is the sign-LSH
    bucketing in operators/similarity.py (same scores, bucketed
    candidate generation)."""
    from flink_etl_spark.functions.vectors import cosine

    a = embs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine("va", "vb"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
