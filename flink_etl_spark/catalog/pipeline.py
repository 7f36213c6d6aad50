"""Composite training-data prep pipeline: the end-to-end shape a
dataset build actually runs — profile every document once, filter on
quality + language, exact-dedup the survivors, and emit the keeper's
signals. One corpus scan feeds every signal (operators/text.doc_profile).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import _t, query
from flink_etl_spark.functions.hashing import MERSENNE_P
from flink_etl_spark.operators.text import STOPWORDS, doc_profile


def _pipeline_oracle() -> str:
    hit_cols = ",\n           ".join(
        "len(list_filter(t, x -> x IN ({}))) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in ws), lang
        )
        for lang, ws in STOPWORDS.items()
    )
    # argmax == 'en' under the greatest-of-structs tie rule (ties go to
    # the lexicographically larger code): en must beat de on ties and
    # strictly beat es/fr/zh
    is_en = (
        "hits_en >= hits_de AND hits_en > hits_es "
        "AND hits_en > hits_fr AND hits_en > hits_zh"
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, text, regexp_split_to_array(text, ' +') AS t
        FROM documents
    ),
    m AS (
        SELECT doc_id, text,
           len(t) AS n_tokens,
           CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dr,
           CAST(len(list_filter(t, x ->
               x IN ('the','a','of','and','to','in','is','it')))
               AS DOUBLE) / len(t) AS sr,
           {hit_cols},
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(t, tok ->
                       CAST(ascii(tok) * 131 + length(tok) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % {MERSENNE_P}) AS fingerprint
        FROM toks
    ),
    scored AS (
        SELECT doc_id, text, n_tokens, fingerprint,
               round(0.4 * least(1.0, n_tokens / 100.0)
                     + 0.3 * dr
                     + 0.3 * least(1.0, 4.0 * sr), 6) AS quality,
               ({is_en}) AS is_en
        FROM m
    ),
    kept AS (
        SELECT * FROM scored WHERE quality >= 0.5 AND is_en
    ),
    dedup AS (
        SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        FROM kept GROUP BY sha256(text)
    )
    SELECT d.keep_id, d.n_copies, s.n_tokens, s.quality, s.fingerprint
    FROM dedup d JOIN kept s ON s.doc_id = d.keep_id
    """


@query("pipeline_training_prep", _pipeline_oracle())
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """profile -> quality>=0.5 -> lang=en -> exact dedup -> keeper stats.

    The plan is one parquet scan + one digest-keyed dedup shuffle + one
    self-join on the (small) survivor set — the profile costs are paid
    exactly once regardless of how many signals the filter uses.

    The dedup groups by sha2(text, 256), NOT raw text, so the exchange
    carries 64-byte keys instead of full documents — the at-scale
    shuffle-key prescription from `operators/dedup.exact_dedup`; the
    digest is computed map-side and the text column is pruned before
    the exchange. The oracle groups by the identical sha256, so the
    groups (and every output value) are byte-for-byte the same."""
    profile = doc_profile(_t(spark, sf_dir, "documents"))
    kept = profile.filter(
        (F.col("verdict") == "keep") & (F.col("lang_guess") == "en")
    )
    dedup = (
        kept.select(F.sha2("text", 256).alias("_digest"), "doc_id")
        .groupBy("_digest")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .drop("_digest")
    )
    return dedup.join(
        kept.select(
            F.col("doc_id").alias("keep_id"), "n_tokens", "quality", "fingerprint"
        ),
        "keep_id",
    ).select("keep_id", "n_copies", "n_tokens", "quality", "fingerprint")
