"""Text-analysis catalog queries over `documents`."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import _t, query
from flink_etl_spark.functions.hashing import MERSENNE_P
from flink_etl_spark.operators import text as T
from flink_etl_spark.operators.text import STOPWORDS


@query(
    "text_token_stats",
    """
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS t FROM documents)
    SELECT doc_id,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_distinct,
           round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS distinct_ratio,
           round(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t), 6)
               AS avg_token_len
    FROM toks
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + vocabulary richness per document."""
    return T.token_stats(_t(spark, sf_dir, "documents"))


def _lang_oracle() -> str:
    hit_cols = ",\n           ".join(
        "len(list_filter(t, x -> x IN ({}))) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in ws), lang
        )
        for lang, ws in STOPWORDS.items()
    )
    unions = "\n        UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS l, hits_{lang} AS s FROM base"
        for lang in STOPWORDS
    )
    hits_out = ", ".join(f"base.hits_{lang}" for lang in STOPWORDS)
    return f"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS t FROM documents),
    base AS (
        SELECT doc_id,
           {hit_cols}
        FROM toks
    ),
    scores AS (
        {unions}
    ),
    guess AS (
        SELECT doc_id, l AS lang_guess
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY s DESC, l DESC) AS rn
              FROM scores) t
        WHERE rn = 1
    )
    SELECT base.doc_id, {hits_out}, guess.lang_guess
    FROM base JOIN guess ON base.doc_id = guess.doc_id
    """


@query("text_lang_id", _lang_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID with deterministic argmax (max score,
    tie -> lexicographically larger code)."""
    return T.lang_scores(_t(spark, sf_dir, "documents")).drop("_toks")


@query(
    "text_quality_score",
    """
    WITH toks AS (SELECT doc_id, n_chars, regexp_split_to_array(text, ' +') AS t
                  FROM documents),
    m AS (
        SELECT doc_id, n_chars,
               len(t) AS n_tokens,
               CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS distinct_ratio,
               CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','it')))
                    AS DOUBLE) / len(t) AS stop_ratio
        FROM toks
    )
    SELECT doc_id, n_chars, n_tokens,
           round(stop_ratio, 6) AS stopword_ratio,
           round(0.4 * least(1.0, n_tokens / 100.0)
                 + 0.3 * distinct_ratio
                 + 0.3 * least(1.0, 4.0 * stop_ratio), 6) AS quality,
           CASE WHEN round(0.4 * least(1.0, n_tokens / 100.0)
                           + 0.3 * distinct_ratio
                           + 0.3 * least(1.0, 4.0 * stop_ratio), 6) >= 0.5
                THEN 'keep' ELSE 'flag' END AS verdict
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length/richness/stopword-density)."""
    return T.quality_scores(_t(spark, sf_dir, "documents"))


@query(
    "text_fingerprint",
    f"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS t FROM documents)
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(t, tok -> CAST(ascii(tok) * 131 + length(tok) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % {MERSENNE_P}) AS fingerprint
    FROM toks
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint over the token sequence."""
    return T.fingerprints(_t(spark, sf_dir, "documents"))


@query(
    "text_bpe_pretokens",
    r"""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(text, '\w+|[^\w\s]') AS toks
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_pretokens,
           len(list_filter(toks, x -> regexp_matches(x, '^\w+$'))) AS n_word,
           len(toks) - len(list_filter(toks, x -> regexp_matches(x, '^\w+$')))
               AS n_punct,
           round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                 / greatest(len(toks), 1), 6) AS avg_pretoken_len
    FROM t
    """,
)
def text_bpe_pretokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counting (GPT-2-family pre-tokenizer
    reduced to its regex core: word runs and single punctuation marks).
    The real BPE merge table is model-specific; the pre-token count is
    the engine-side signal pipelines filter on."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.expr(r"regexp_extract_all(text, '\\w+|[^\\w\\s]', 0)")
    words = F.filter(F.col("_t"), lambda x: x.rlike("^\\w+$"))
    return docs.select(F.col("doc_id"), toks.alias("_t")).select(
        "doc_id",
        F.size("_t").alias("n_pretokens"),
        F.size(words).alias("n_word"),
        (F.size("_t") - F.size(words)).alias("n_punct"),
        F.round(
            F.aggregate(F.col("_t"), F.lit(0), lambda a, x: a + F.length(x))
            / F.greatest(F.size("_t"), F.lit(1)).cast("double"),
            6,
        ).alias("avg_pretoken_len"),
    )


@query(
    "text_top_bigrams",
    """
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(text, ' +') AS t FROM documents
    ),
    bg AS (
        SELECT doc_id, b
        FROM toks, UNNEST(
            CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)),
                                     i -> concat_ws(' ', t[i], t[i+1]))
                 ELSE [] END) AS u(b)
    )
    SELECT b AS bigram,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM bg
    GROUP BY b
    HAVING count(*) >= 10
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-level n-gram statistics (the per-doc ops above are
    row-local): bigram frequency + document frequency for bigrams with
    >= 10 occurrences. One explode + one groupBy; at corpus scale the
    HAVING threshold is what keeps the long tail from dominating the
    shuffle (pre-aggregate partial counts do the rest)."""
    from flink_etl_spark.functions.hashing import shingles_expr, tokens_expr

    docs = _t(spark, sf_dir, "documents")
    bg = docs.select(
        "doc_id",
        F.explode(shingles_expr(tokens_expr("text"), 2)).alias("bigram"),
    )
    return (
        bg.groupBy("bigram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= 10)
    )


@query(
    "text_tfidf_topk",
    """
    WITH toks AS (
        SELECT doc_id, tk AS term
        FROM (SELECT doc_id, regexp_split_to_array(text, ' +') AS t
              FROM documents) d, UNNEST(t) AS u(tk)
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rnk
          FROM scored) t
    WHERE rnk <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by TF-IDF (tf * ln(N/df)): two shuffles,
    no vocabulary dictionary, WindowGroupLimit top-k."""
    docs = _t(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs, k=3)
