"""Text-analysis catalog queries over `documents`."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import _t, query
from flink_etl_spark.functions.hashing import MERSENNE_P
from flink_etl_spark.operators import text as T
from flink_etl_spark.operators.text import STOPWORDS


def _profile_oracle() -> str:
    hit_cols = ",\n               ".join(
        "len(list_filter(t, x -> x IN ({}))) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in ws), lang
        )
        for lang, ws in STOPWORDS.items()
    )
    unions = "\n        UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS l, hits_{lang} AS s FROM base"
        for lang in STOPWORDS
    )
    hits_out = ", ".join(f"b.hits_{lang}" for lang in STOPWORDS)
    score = (
        "0.4 * least(1.0, b.n_tokens / 100.0)"
        " + 0.3 * (CAST(b.n_distinct AS DOUBLE) / b.n_tokens)"
        " + 0.3 * least(1.0, 4.0 * (CAST(b.hits_en AS DOUBLE) / b.n_tokens))"
    )
    return f"""
    WITH toks AS (SELECT doc_id, n_chars, regexp_split_to_array(text, ' +') AS t
                  FROM documents),
    base AS (
        SELECT doc_id, n_chars,
               len(t) AS n_tokens,
               len(list_distinct(t)) AS n_distinct,
               list_sum(list_transform(t, x -> length(x))) AS tot_len,
               {hit_cols},
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(t, tok ->
                           CAST(ascii(tok) * 131 + length(tok) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % {MERSENNE_P}) AS fingerprint
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
    SELECT b.doc_id, b.n_chars, b.n_tokens, b.n_distinct,
           round(CAST(b.tot_len AS DOUBLE) / b.n_tokens, 6) AS avg_token_len,
           round(CAST(b.n_distinct AS DOUBLE) / b.n_tokens, 6) AS distinct_ratio,
           round(CAST(b.hits_en AS DOUBLE) / b.n_tokens, 6) AS stopword_ratio,
           {hits_out},
           g.lang_guess,
           round({score}, 6) AS quality,
           CASE WHEN round({score}, 6) >= 0.5 THEN 'keep' ELSE 'flag' END AS verdict,
           b.fingerprint
    FROM base b JOIN guess g ON b.doc_id = g.doc_id
    """


@query("text_doc_profile", _profile_oracle())
def text_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY per-document text signal off ONE tokenization pass
    (operators/text.py doc_profile — former gates `text_token_stats`,
    `text_lang_id`, `text_quality_score`, `text_fingerprint`, folded
    into the one-scan operator a 100 TB prep pipeline actually runs):

    * token counting + vocabulary richness (n_tokens, n_distinct,
      avg_token_len, distinct_ratio);
    * stopword-hit language ID with deterministic argmax (max score,
      tie -> lexicographically larger code);
    * composite quality heuristic (length/richness/stopword-density)
      with keep/flag verdict;
    * order-sensitive rolling polynomial fingerprint.

    The individual operators remain available as composable units
    (token_stats/lang_scores/quality_scores/fingerprints, each
    unit-tested); chaining them would tokenize N times — at corpus
    scale tokenization IS the cost, so the profile computes all
    signals in one whole-stage-codegen projection."""
    return T.doc_profile(_t(spark, sf_dir, "documents")).drop("text")


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
           -- coalesce: DuckDB list_sum([]) is NULL where Spark's
           -- aggregate-with-0-seed yields 0 — a whitespace-only doc
           -- must give 0.0 on both sides
           round(CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                      AS DOUBLE)
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
