"""Property-based tests (hypothesis) for the training-prep operators:
invariants that must hold for ANY corpus, not just the fixtures —
the same strategy as tests/test_property_cdc.py for the CDC core.

Each property runs a small number of examples against the session
Spark fixture (Spark round-trips dominate, so examples are few but
each covers a whole generated corpus)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from flink_etl_spark.operators import prep as P

#: word-ish tokens (include repeats to exercise dup metrics)
_words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "ion", "flux", "x", "data", "spark"]
)
_texts = st.lists(_words, min_size=0, max_size=30).map(" ".join)

_corpora = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6), _texts),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)

_PROP = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_PROP)
@given(rows=_corpora)
def test_repetition_stats_invariants(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = P.repetition_stats(docs).collect()
    assert len(out) == len(rows)  # every doc appears exactly once
    for r in out:
        assert 0.0 <= r["dup_token_frac"] <= 1.0
        assert 0.0 <= r["top_bigram_char_frac"] <= 1.0
        assert 0.0 <= r["dup_trigram_char_frac"] <= 1.0
        if r["n_tokens"] < 2:
            assert r["top_bigram"] is None and r["top_bigram_count"] == 0
        else:
            assert r["top_bigram_count"] >= 1


@settings(**_PROP)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=0, max_value=800),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(min_value=1, max_value=600),
)
def test_pack_greedy_invariants(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = (
        P.pack_greedy(
            df.withColumn("g", F.lit("all")), budget=budget, part_cols=("g",)
        )
        .orderBy("doc_id")
        .collect()
    )
    # offsets stay inside the budget; seq_ids are non-decreasing in
    # id order; global token accounting reconstructs the prefix sum
    prefix = 0
    last_seq = 0
    for r in out:
        assert 0 <= r["seq_offset"] < budget
        assert r["seq_id"] * budget + r["seq_offset"] == prefix
        assert r["seq_id"] >= last_seq
        assert r["overflow_doc"] == (r["n_tokens"] > budget)
        last_seq = r["seq_id"]
        prefix += r["n_tokens"]


@settings(**_PROP)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    salt=st.text(
        alphabet="abc'x", min_size=0, max_size=4
    ),  # quote included: escaping must hold
)
def test_hash_split_partition_property(spark, keys, salt):
    """Every row gets exactly one label from the configured set, and
    the assignment is a pure function of (key, salt) — recomputing
    yields the identical frame."""
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    a = P.hash_split(df, "doc_id", salt=salt).collect()
    b = P.hash_split(df, "doc_id", salt=salt).collect()
    labels = {lbl for lbl, _ in P.DEFAULT_SPLITS}
    assert all(r["split"] in labels for r in a)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@settings(**_PROP)
@given(rows=_corpora)
def test_pii_redact_idempotent(spark, rows):
    """Redaction is idempotent: the replacement tokens contain no
    redactable patterns, so a second pass is a no-op."""
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        # plant pii derived from the row so some examples match
        "text",
        F.concat(
            F.col("text"),
            F.lit(" u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex.org 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ),
    )
    once = P.pii_redact(docs).select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    twice = P.pii_redact(once)
    assert twice.filter(
        (F.col("n_email") > 0) | (F.col("n_phone") > 0) | (F.col("n_ipv4") > 0)
    ).count() == 0
    assert twice.filter(F.col("text_redacted") != F.col("text")).count() == 0


@settings(**_PROP)
@given(rows=_corpora, n=st.integers(min_value=1, max_value=4))
def test_decontaminate_self_overlap(spark, rows, n):
    """A corpus checked against ITSELF: every doc with >= n tokens is
    contaminated (it shares its own grams); shorter docs are clean."""
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.decontaminate(docs, docs, n=n).collect()}
    toks = {i: (t.split(" ") if t else [""]) for i, t in rows}
    for i, t in rows:
        has_gram = len([w for w in toks[i]]) >= n
        assert out[i]["contaminated"] == (1 if has_gram else 0)
