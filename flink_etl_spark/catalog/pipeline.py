"""Composite training-data prep pipeline: the end-to-end shape a
dataset build actually runs — profile every document once, filter on
quality + language, exact-dedup the survivors, and emit the keeper's
signals. One corpus scan feeds every signal (operators/text.doc_profile).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import _t, exact_decimal_avg, query
from flink_etl_spark.functions.hashing import MERSENNE_P
from flink_etl_spark.operators.text import STOPWORDS, doc_profile


#: per-source keeper cap for the balanced-split arm. sf0.01 holds
#: exactly 25 documents per source (500 docs / 20 sources) and fewer
#: keepers after the quality+lang filter, so the cap must sit BELOW
#: that for the gate to actually exercise cap_per_group and its
#: quality-desc tie-break (at 100 a deleted QUALIFY clause would have
#: left the gate green — the cap never bound)
_SOURCE_CAP = 10

#: token budget for the packing arm — small enough that sf0.01 produces
#: multi-sequence groups with real fill variance
_PACK_BUDGET = 512

#: per-source mixture rates for the 'mixture' arm: every regime in one
#: gate — drop (0), downsample (0.5), keep (1), upsample with a
#: fractional epoch (1.5, 2.25). Sources beyond src19 (none in the
#: testdata) fall to the default rate 1.0.
_MIX_RATES: dict[str, float] = {
    f"src{i}": (0.0, 0.5, 1.0, 1.5, 2.25)[i % 5] for i in range(20)
}

#: weighted-sample arm knobs: per-source top-8 Efraimidis-Spirakis
#: draw with n_chars as the weight, salt=0 (coefficient pair 0 — the
#: oracle embeds it, so the arm pins the salt)
_WS_N = 8

#: dsir_selected arm: per-source Gumbel-top-k draw size (binding at
#: sf0.01's ~12 odd docs per source)
_DSIR_N = 4
from flink_etl_spark.functions.hashing import MINHASH_COEFFS as _MC  # noqa: E402

_WS_A, _WS_B = _MC[0]


def _pipeline_oracle() -> str:
    from flink_etl_spark.catalog import duckdb_exact_decimal_avg
    from flink_etl_spark.operators.prep import (
        duckdb_mixture_copies,
        duckdb_split_expr,
    )
    from flink_etl_spark.operators.text import duckdb_quality_micro

    _q_micro = duckdb_quality_micro("n_tokens", "nd", "en_hits")

    _split_case = duckdb_split_expr("keep_id")
    _mix_copies = duckdb_mixture_copies("keep_id", "source", _MIX_RATES)
    _eavg_quality = duckdb_exact_decimal_avg("quality", 6)
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
           len(list_distinct(t)) AS nd,
           len(list_filter(t, x ->
               x IN ('the','a','of','and','to','in','is','it'))) AS en_hits,
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
               {_q_micro} AS quality,
               ({is_en}) AS is_en
        FROM m
    ),
    kept AS (
        SELECT * FROM scored WHERE quality >= 0.5 AND is_en
    ),
    dedup AS (
        SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        FROM kept GROUP BY sha256(text)
    ),
    keepers AS (
        SELECT d.keep_id, d.n_copies, s.n_tokens, s.quality, s.fingerprint
        FROM dedup d JOIN kept s ON s.doc_id = d.keep_id
    ),
    sourced AS (
        SELECT k.*, doc.source
        FROM keepers k JOIN documents doc ON doc.doc_id = k.keep_id
    ),
    balanced AS (
        SELECT * FROM sourced
        QUALIFY row_number() OVER (PARTITION BY source
                                   ORDER BY quality DESC, keep_id)
                <= {_SOURCE_CAP}
    ),
    mixture AS (
        SELECT source, n_tokens, {_mix_copies} AS n_copies FROM sourced
    ),
    assigned AS (
        SELECT *, {_split_case} AS split FROM balanced
    ),
    packed AS (
        SELECT source,
               CAST(floor(cum0 / {_PACK_BUDGET}) AS BIGINT) AS seq_id,
               n_tokens
        FROM (SELECT source, keep_id, n_tokens,
                     coalesce(sum(n_tokens) OVER (
                         PARTITION BY source ORDER BY keep_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS cum0
              FROM balanced) b
    )
    SELECT 'keepers' AS variant,
           keep_id, n_copies, n_tokens, quality, fingerprint,
           CAST(NULL AS VARCHAR) AS split,
           CAST(NULL AS VARCHAR) AS source,
           CAST(NULL AS BIGINT) AS n_docs,
           CAST(NULL AS BIGINT) AS sum_tokens,
           CAST(NULL AS DOUBLE) AS avg_quality,
           CAST(NULL AS BIGINT) AS seq_id,
           CAST(NULL AS BIGINT) AS seq_docs,
           CAST(NULL AS BIGINT) AS seq_tokens,
           CAST(NULL AS DOUBLE) AS fill_frac
    FROM keepers
    UNION ALL
    SELECT 'split_summary' AS variant,
           CAST(NULL AS BIGINT) AS keep_id,
           CAST(NULL AS BIGINT) AS n_copies,
           CAST(NULL AS BIGINT) AS n_tokens,
           CAST(NULL AS DOUBLE) AS quality,
           CAST(NULL AS BIGINT) AS fingerprint,
           split, source,
           count(*) AS n_docs,
           -- DuckDB sum(BIGINT) is HUGEINT (-> float64 in pandas);
           -- Spark's is LONG — cast for an exact dtype match
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           -- exact integer-sum mean (catalog.exact_decimal_avg):
           -- float addition order differs between engines (flips a
           -- naive avg's 6th decimal), and round(x, 6) disagrees on
           -- the exact-half edges a small-count mean produces
           {_eavg_quality} AS avg_quality,
           CAST(NULL AS BIGINT) AS seq_id,
           CAST(NULL AS BIGINT) AS seq_docs,
           CAST(NULL AS BIGINT) AS seq_tokens,
           CAST(NULL AS DOUBLE) AS fill_frac
    FROM assigned
    GROUP BY split, source
    UNION ALL
    SELECT 'packing' AS variant,
           CAST(NULL AS BIGINT) AS keep_id,
           CAST(NULL AS BIGINT) AS n_copies,
           CAST(NULL AS BIGINT) AS n_tokens,
           CAST(NULL AS DOUBLE) AS quality,
           CAST(NULL AS BIGINT) AS fingerprint,
           CAST(NULL AS VARCHAR) AS split,
           source,
           CAST(NULL AS BIGINT) AS n_docs,
           CAST(NULL AS BIGINT) AS sum_tokens,
           CAST(NULL AS DOUBLE) AS avg_quality,
           seq_id,
           count(*) AS seq_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           -- exact integer sum / one division: same IEEE double both sides
           CAST(sum(n_tokens) AS BIGINT) / {_PACK_BUDGET}.0 AS fill_frac
    FROM packed
    GROUP BY source, seq_id
    UNION ALL
    SELECT 'mixture' AS variant,
           CAST(NULL AS BIGINT) AS keep_id,
           CAST(NULL AS BIGINT) AS n_copies,
           CAST(NULL AS BIGINT) AS n_tokens,
           CAST(NULL AS DOUBLE) AS quality,
           CAST(NULL AS BIGINT) AS fingerprint,
           CAST(NULL AS VARCHAR) AS split,
           source,
           CAST(sum(n_copies) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens * n_copies) AS BIGINT) AS sum_tokens,
           CAST(NULL AS DOUBLE) AS avg_quality,
           CAST(NULL AS BIGINT) AS seq_id,
           CAST(NULL AS BIGINT) AS seq_docs,
           CAST(NULL AS BIGINT) AS seq_tokens,
           CAST(NULL AS DOUBLE) AS fill_frac
    FROM mixture
    WHERE n_copies >= 1
    GROUP BY source
    UNION ALL
    SELECT 'weighted_sample' AS variant,
           doc_id AS keep_id,
           CAST(NULL AS BIGINT) AS n_copies,
           CAST(n_chars AS BIGINT) AS n_tokens,
           pr AS quality,
           CAST(NULL AS BIGINT) AS fingerprint,
           CAST(NULL AS VARCHAR) AS split,
           source,
           CAST(NULL AS BIGINT) AS n_docs,
           CAST(NULL AS BIGINT) AS sum_tokens,
           CAST(NULL AS DOUBLE) AS avg_quality,
           CAST(NULL AS BIGINT) AS seq_id,
           CAST(NULL AS BIGINT) AS seq_docs,
           CAST(NULL AS BIGINT) AS seq_tokens,
           CAST(NULL AS DOUBLE) AS fill_frac
    FROM (
        SELECT doc_id, source, n_chars, pr,
               row_number() OVER (PARTITION BY source
                                  ORDER BY pr DESC, doc_id) AS rn
        FROM (
            SELECT doc_id, source, n_chars,
                   -- round ln(u) (fixed range) BEFORE the exact double
                   -- division: rounding the quotient collapses large
                   -- weights onto the 6dp grid (see weighted_sample_n)
                   round(ln(((({_WS_A} * (doc_id % {MERSENNE_P}) + {_WS_B})
                              % {MERSENNE_P}) + 1)
                            / {float(MERSENNE_P + 1)!r}), 6) / n_chars AS pr
            FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0
        ) s
    ) t
    WHERE rn <= {_WS_N}
    UNION ALL
    SELECT 'dsir_selected' AS variant,
           doc_id AS keep_id,
           CAST(NULL AS BIGINT) AS n_copies,
           n_feats AS n_tokens,
           gkey AS quality,
           CAST(NULL AS BIGINT) AS fingerprint,
           CAST(NULL AS VARCHAR) AS split,
           source,
           CAST(NULL AS BIGINT) AS n_docs,
           CAST(NULL AS BIGINT) AS sum_tokens,
           CAST(NULL AS DOUBLE) AS avg_quality,
           CAST(NULL AS BIGINT) AS seq_id,
           CAST(NULL AS BIGINT) AS seq_docs,
           CAST(NULL AS BIGINT) AS seq_tokens,
           CAST(NULL AS DOUBLE) AS fill_frac
    FROM (
        WITH ptoks AS (
            SELECT doc_id, regexp_split_to_array(text, ' +') AS t
            FROM documents
        ),
        pfeat AS (
            SELECT doc_id, tok AS f FROM ptoks, UNNEST(t) AS u(tok)
            UNION ALL
            SELECT doc_id, concat_ws(' ', t[i], t[i+1]) AS f
            FROM ptoks, UNNEST(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2
        ),
        pct AS (SELECT f, count(*) AS ct FROM pfeat
                WHERE doc_id % 2 = 0 GROUP BY 1),
        pcq AS (SELECT f, count(*) AS cq FROM pfeat
                WHERE doc_id % 2 = 1 GROUP BY 1),
        ptot AS (
            SELECT (SELECT count(DISTINCT f) FROM pfeat) AS v,
                   (SELECT count(*) FROM pfeat WHERE doc_id % 2 = 0) AS nt,
                   (SELECT count(*) FROM pfeat WHERE doc_id % 2 = 1) AS nq
        ),
        plogw AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                   sum(CAST(floor(
                       (ln((coalesce(ct, 0) + 1.0) / (nt + v))
                        - ln((coalesce(cq, 0) + 1.0) / (nq + v)))
                       * 1000000.0) AS BIGINT)) AS logw_micro
            FROM (SELECT * FROM pfeat WHERE doc_id % 2 = 1) d
            LEFT JOIN pct USING (f)
            LEFT JOIN pcq USING (f)
            CROSS JOIN ptot
            GROUP BY doc_id
        )
        SELECT w.doc_id, w.n_feats, doc.source,
               -- Gumbel-top-k key: exact logw double + 6dp Gumbel noise
               -- from the same salt-0 affine u as the engine
               CAST(w.logw_micro AS DOUBLE) / 1000000.0
               + round(-ln(-ln(((({_WS_A} * (w.doc_id % {MERSENNE_P})
                                  + {_WS_B}) % {MERSENNE_P}) + 1)
                               / {float(MERSENNE_P + 1)!r})), 6) AS gkey,
               row_number() OVER (
                   PARTITION BY doc.source
                   ORDER BY CAST(w.logw_micro AS DOUBLE) / 1000000.0
                            + round(-ln(-ln(((({_WS_A} * (w.doc_id
                                               % {MERSENNE_P}) + {_WS_B})
                                              % {MERSENNE_P}) + 1)
                                            / {float(MERSENNE_P + 1)!r})), 6)
                            DESC, w.doc_id) AS rn
        FROM plogw w JOIN documents doc ON doc.doc_id = w.doc_id
    ) s
    WHERE rn <= {_DSIR_N}
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
    groups (and every output value) are byte-for-byte the same.

    Three union-tagged arms (folded gates, same pattern as
    dedup_minhash_lsh):

    * variant 'keepers' — the dedup survivors with their signals (the
      original gate output);
    * variant 'split_summary' — the LAST stages of a dataset build:
      per-source balancing (cap _SOURCE_CAP=10 keepers per source —
      BINDING at sf0.01's 25 docs/source,
      quality-desc deterministic order — operators/prep.cap_per_group,
      WindowGroupLimit) then a leakage-safe deterministic train/val/
      test hash split (operators/prep.hash_split; the oracle-portable
      charfold arm — production default is xxhash64), summarized per
      (split, source). The split is a pure function of keep_id, so
      incremental corpus appends never reshuffle earlier assignments.
    * variant 'packing' — fixed token-budget sequence packing of the
      balanced keepers (operators/prep.pack_greedy: start-offset
      binning via one window prefix-sum per source, _PACK_BUDGET=512),
      summarized per (source, seq_id) with fill fraction — the final
      materialization stage of a training-data build.
    * variant 'mixture' — deterministic per-source mixture sampling
      (operators/prep.mixture_sample over the pre-cap keeper pool,
      _MIX_RATES spans drop/downsample/keep/fractional-upsample;
      oracle-portable charfold arm — production default is xxhash64),
      summarized per source as copy counts + copy-weighted tokens.
    * variant 'weighted_sample' (r8) — Efraimidis-Spirakis weighted
      sampling WITHOUT replacement (operators/prep.weighted_sample_n):
      per-source top-8 by ln(u)/weight priority with n_chars as the
      weight and u a salted affine hash of doc_id — the exact-n,
      weight-proportional draw the rate-based `mixture_sample` cannot
      express; deterministic per (id, salt), oracle-exact (priority
      in the quality column, weight in n_tokens).
    * variant 'dsir_selected' (r9) — the DSIR selection END TO END
      (operators/prep.dsir_log_weights + dsir_select_n, Xie et al.
      2023): importance weights of odd-doc_id documents against the
      even half as target, then a per-source Gumbel-top-4 draw —
      sampling without replacement proportional to exp(logw), the
      Gumbel noise a pure function of (doc_id, salt). The gate pins
      the SELECTED ID SET and the exact Gumbel keys (quality column)
      against the DuckDB replica — the cross-engine determinism claim
      of the whole sampling family, verified at the hash level.
      (keep_id = doc_id, n_tokens = feature count, quality = key.)
    """
    from flink_etl_spark.operators.prep import (
        cap_per_group,
        hash_split,
        mixture_sample,
        pack_greedy,
    )

    profile = doc_profile(
        _t(spark, sf_dir, "documents"), passthrough=("source",)
    )
    # single-pass dedup (operators/dedup.exact_dedup carry_cols): the
    # keeper row's signals ride the min(struct) aggregate — one scan,
    # one digest-keyed shuffle, NO join back to the corpus. The former
    # dedup-agg + self-join shape scanned and re-profiled `documents`
    # twice, and the downstream arms joined a THIRD scan for `source`
    # (now a doc_profile passthrough riding the same struct). The
    # shuffle carries 32-byte digests plus small scalars, never text.
    #
    # The quality+language filter rides the aggregate (where_col, r15)
    # instead of a pre-aggregate .filter(): the filter form gets
    # pushed below doc_profile's projection and re-derives the whole
    # token profile a second time per row in the Filter operator
    # (plans/r15/pipeline_training_prep_before.txt — the pushed
    # condition re-tokenizes `text` for quality AND the language
    # argmax); folded into the aggregate the corpus is tokenized
    # exactly once. Value-identical: a group with no passing copy is
    # dropped by the count_if >= 1 guard inside exact_dedup.
    from flink_etl_spark.operators.dedup import exact_dedup

    sourced = exact_dedup(
        profile.select(
            F.sha2("text", 256).alias("_digest"),
            "doc_id", "n_tokens", "quality", "fingerprint", "source",
            (
                (F.col("verdict") == "keep")
                & (F.col("lang_guess") == "en")
            ).alias("_pass"),
        ),
        ["_digest"],
        "doc_id",
        carry_cols=("n_tokens", "quality", "fingerprint", "source"),
        where_col="_pass",
    ).select(
        "keep_id", "n_copies", "n_tokens", "quality", "fingerprint", "source"
    )
    keepers = sourced.drop("source")
    balanced = cap_per_group(
        sourced,
        ["source"],
        [F.col("quality").desc(), F.col("keep_id")],
        n=_SOURCE_CAP,
    )
    mixture = (
        mixture_sample(
            sourced.select("keep_id", "source", "n_tokens"),
            _MIX_RATES,
            group_col="source",
            key_col="keep_id",
            hash_fn="charfold",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )
    summary = (
        hash_split(balanced, "keep_id", hash_fn="charfold")
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            # exact integer-sum mean (catalog.exact_decimal_avg):
            # naive avg() differs by addition order; round(x, 6)
            # disagrees on the exact-half edges a small-count mean
            # produces
            exact_decimal_avg(F.col("quality"), 6).alias("avg_quality"),
        )
    )

    packing = (
        pack_greedy(
            balanced,
            budget=_PACK_BUDGET,
            id_col="keep_id",
            tokens_col="n_tokens",
            part_cols=("source",),
        )
        .groupBy("source", "seq_id")
        .agg(
            F.count("*").alias("seq_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .withColumn(
            # exact integer sum / one division: same IEEE double as the
            # oracle's
            "fill_frac",
            F.col("seq_tokens") / F.lit(float(_PACK_BUDGET)),
        )
    )

    keepers_arm = keepers.select(
        F.lit("keepers").alias("variant"),
        "keep_id", "n_copies", "n_tokens", "quality", "fingerprint",
        F.lit(None).cast("string").alias("split"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("sum_tokens"),
        F.lit(None).cast("double").alias("avg_quality"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("seq_docs"),
        F.lit(None).cast("long").alias("seq_tokens"),
        F.lit(None).cast("double").alias("fill_frac"),
    )
    summary_arm = summary.select(
        F.lit("split_summary").alias("variant"),
        F.lit(None).cast("long").alias("keep_id"),
        F.lit(None).cast("long").alias("n_copies"),
        F.lit(None).cast("long").alias("n_tokens"),
        F.lit(None).cast("double").alias("quality"),
        F.lit(None).cast("long").alias("fingerprint"),
        "split", "source", "n_docs", "sum_tokens", "avg_quality",
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("seq_docs"),
        F.lit(None).cast("long").alias("seq_tokens"),
        F.lit(None).cast("double").alias("fill_frac"),
    )
    packing_arm = packing.select(
        F.lit("packing").alias("variant"),
        F.lit(None).cast("long").alias("keep_id"),
        F.lit(None).cast("long").alias("n_copies"),
        F.lit(None).cast("long").alias("n_tokens"),
        F.lit(None).cast("double").alias("quality"),
        F.lit(None).cast("long").alias("fingerprint"),
        F.lit(None).cast("string").alias("split"),
        "source",
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("sum_tokens"),
        F.lit(None).cast("double").alias("avg_quality"),
        "seq_id", "seq_docs", "seq_tokens", "fill_frac",
    )
    mixture_arm = mixture.select(
        F.lit("mixture").alias("variant"),
        F.lit(None).cast("long").alias("keep_id"),
        F.lit(None).cast("long").alias("n_copies"),
        F.lit(None).cast("long").alias("n_tokens"),
        F.lit(None).cast("double").alias("quality"),
        F.lit(None).cast("long").alias("fingerprint"),
        F.lit(None).cast("string").alias("split"),
        "source", "n_docs", "sum_tokens",
        F.lit(None).cast("double").alias("avg_quality"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("seq_docs"),
        F.lit(None).cast("long").alias("seq_tokens"),
        F.lit(None).cast("double").alias("fill_frac"),
    )
    from flink_etl_spark.operators.prep import weighted_sample_n

    ws_arm = weighted_sample_n(
        _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars"),
        n=_WS_N, weight_col="n_chars", salt=0, group_cols=("source",),
    ).select(
        F.lit("weighted_sample").alias("variant"),
        F.col("doc_id").alias("keep_id"),
        F.lit(None).cast("long").alias("n_copies"),
        F.col("n_chars").cast("long").alias("n_tokens"),
        F.col("priority").alias("quality"),
        F.lit(None).cast("long").alias("fingerprint"),
        F.lit(None).cast("string").alias("split"),
        "source",
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("sum_tokens"),
        F.lit(None).cast("double").alias("avg_quality"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("seq_docs"),
        F.lit(None).cast("long").alias("seq_tokens"),
        F.lit(None).cast("double").alias("fill_frac"),
    )
    from flink_etl_spark.operators.prep import (
        dsir_log_weights,
        dsir_select_n,
    )

    docs_all = _t(spark, sf_dir, "documents")
    dw = dsir_log_weights(
        docs_all.filter(F.col("doc_id") % 2 == 1),
        target_docs=docs_all.filter(F.col("doc_id") % 2 == 0),
        hash_terms=False,  # gate pins strings; production hashes
    ).join(docs_all.select("doc_id", "source"), "doc_id")
    dsir_arm = dsir_select_n(
        dw, n=_DSIR_N, salt=0, group_cols=("source",)
    ).select(
        F.lit("dsir_selected").alias("variant"),
        F.col("doc_id").alias("keep_id"),
        F.lit(None).cast("long").alias("n_copies"),
        F.col("n_feats").alias("n_tokens"),
        F.col("gumbel_key").alias("quality"),
        F.lit(None).cast("long").alias("fingerprint"),
        F.lit(None).cast("string").alias("split"),
        "source",
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("sum_tokens"),
        F.lit(None).cast("double").alias("avg_quality"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("seq_docs"),
        F.lit(None).cast("long").alias("seq_tokens"),
        F.lit(None).cast("double").alias("fill_frac"),
    )
    return (
        keepers_arm.unionByName(summary_arm)
        .unionByName(packing_arm)
        .unionByName(mixture_arm)
        .unionByName(ws_arm)
        .unionByName(dsir_arm)
    )
