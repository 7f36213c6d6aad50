"""Data-derived knob sizing (operators/knobs.py): pure-function
properties plus the operators' "auto" / max_bucket integration."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_etl_spark.operators.knobs import (
    ivf_auto_cells,
    minhash_auto_bands,
    resolve_knob,
    signlsh_auto_planes,
    simhash_auto_bits,
)


def test_simhash_auto_bits_monotone_and_clamped():
    widths = [simhash_auto_bits(n) for n in (10, 100, 1_000, 25_000, 10**7, 10**12)]
    assert widths == sorted(widths)  # wider corpora need wider signatures
    assert all(16 <= b <= 63 for b in widths)
    assert simhash_auto_bits(10**30) == 63  # hard ceiling (LONG sign bit)


def test_simhash_auto_bits_bounds_accidental_pairs():
    """The returned width must actually satisfy the collision budget the
    docstring promises (expected accidental pairs <= 1, absolute)."""
    from math import comb

    for n in (500, 25_000, 10**6):
        bits = simhash_auto_bits(n)
        ways = sum(comb(bits, i) for i in range(3))
        expected = n * (n - 1) / 2 * ways / float(1 << bits)
        assert expected <= 1.0
    # the measured failure case: 16 bits at 25k docs blows any budget
    ways16 = sum(comb(16, i) for i in range(3))
    assert 25_000 * 24_999 / 2 * ways16 / 2.0**16 > 1.0


def test_simhash_auto_bits_margin_over_uniform_floor():
    """The default width is the uniform-model solution plus the
    measured correlation margin (8 bits), ceilinged at 63; margin 0
    recovers the bare uniform floor."""
    for n in (500, 25_000, 10**6):
        bare = simhash_auto_bits(n, margin_bits=0)
        assert simhash_auto_bits(n) == min(63, bare + 8)
    # margined widths stay monotone and within the LONG-safe range
    ws = [simhash_auto_bits(n) for n in (100, 10_000, 10**6, 10**9)]
    assert ws == sorted(ws) and all(16 <= w <= 63 for w in ws)


@pytest.mark.slow
def test_simhash_max_bucket_caps_adversarial_clique(spark):
    """A 200-doc exact clique shares every chunk value, so its buckets
    go quadratic; max_bucket drops them while ordinary pairs (small
    buckets) survive untouched — the lsh_candidates cap's twin."""
    from flink_etl_spark.operators.dedup import simhash_near_dups

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    clique = base.limit(1)
    for i in range(1, 200):
        clique = clique.unionByName(
            base.limit(1).withColumn("doc_id", F.col("doc_id") + F.lit(100_000 + i))
        )
    docs = base.unionByName(clique)
    uncapped = simhash_near_dups(docs, max_hamming=2, bits=32)
    capped = simhash_near_dups(docs, max_hamming=2, bits=32, max_bucket=50)
    n_capped, n_uncapped = capped.count(), uncapped.count()
    assert n_uncapped >= 200 * 199 / 2  # clique blowup present
    assert n_capped < 1_000  # bounded after the cap
    ordinary = uncapped.filter("doc_a < 1000 AND doc_b < 1000")
    ordinary_capped = capped.filter("doc_a < 1000 AND doc_b < 1000")
    assert sorted(map(tuple, ordinary.collect())) == sorted(
        map(tuple, ordinary_capped.collect())
    )


def test_signlsh_auto_planes_targets_bucket_occupancy():
    assert signlsh_auto_planes(500) == 4  # the sf0.01 gate default
    assert signlsh_auto_planes(10_000) >= 8  # the stress-probe sizing
    ps = [signlsh_auto_planes(n) for n in (100, 1_000, 10_000, 10**6, 10**9)]
    assert ps == sorted(ps)
    assert all(2 <= p <= 24 for p in ps)


def test_ivf_auto_cells_sqrt_rule():
    assert ivf_auto_cells(10_000) == 100
    # never more cells than vectors, even for degenerate corpora
    assert [ivf_auto_cells(n) for n in (1, 2, 3)] == [1, 2, 3]
    assert ivf_auto_cells(16) == 4
    assert ivf_auto_cells(10**10) == 65_536  # ceiling
    cs = [ivf_auto_cells(n) for n in (100, 10_000, 10**6)]
    assert cs == sorted(cs)


def test_minhash_auto_bands_divides_and_tracks_threshold():
    for t in (0.3, 0.5, 0.8, 0.95):
        b = minhash_auto_bands(t, 16)
        assert 16 % b == 0
    # higher thresholds want fewer, taller bands (S-curve moves right)
    assert minhash_auto_bands(0.95, 16) <= minhash_auto_bands(0.3, 16)
    with pytest.raises(ValueError):
        minhash_auto_bands(1.5, 16)


def test_resolve_knob_passthrough_and_validation():
    assert resolve_knob(7, simhash_auto_bits, None, None) == 7
    assert resolve_knob("auto", simhash_auto_bits, None, 25_000) == simhash_auto_bits(
        25_000
    )
    with pytest.raises(ValueError):
        resolve_knob("wide", simhash_auto_bits, None, None)


def test_simhash_auto_equals_explicit(spark):
    """bits="auto" must equal the explicit run at the derived width —
    auto is sizing, never a different algorithm."""
    from flink_etl_spark.operators.dedup import simhash_signatures

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    auto = simhash_signatures(docs, bits="auto").orderBy("doc_id").collect()
    explicit = (
        simhash_signatures(docs, bits=simhash_auto_bits(n)).orderBy("doc_id").collect()
    )
    assert auto == explicit
    assert simhash_auto_bits(n) > 16  # corpus is already past the 16-bit floor


@pytest.mark.slow
def test_max_bucket_caps_adversarial_clique(spark):
    """A 200-doc exact clique makes every band bucket hold >=200 docs ->
    ~19900 candidate pairs per band unbounded. max_bucket drops those
    buckets, bounding candidate volume; ordinary near-dup pairs outside
    the clique survive (their buckets are small)."""
    from flink_etl_spark.operators.dedup import lsh_candidates, minhash_profile

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    clique = base.limit(1)
    for i in range(1, 200):
        clique = clique.unionByName(
            base.limit(1).withColumn("doc_id", F.col("doc_id") + F.lit(100_000 + i))
        )
    docs = base.unionByName(clique)
    prof = minhash_profile(docs).filter(F.col("n_sh") > 0)
    capped = lsh_candidates(prof.drop("shset"), max_bucket=50)
    uncapped = lsh_candidates(prof.drop("shset"))
    n_capped, n_uncapped = capped.count(), uncapped.count()
    # the clique contributes ~200*199/2 pairs uncapped; capping removes
    # the oversized buckets entirely
    assert n_uncapped >= 199 * 100  # quadratic blowup present
    assert n_capped < 1_000  # bounded after the cap
    # pairs among the 20 ordinary docs are unaffected (buckets <= 21)
    ordinary = uncapped.filter("doc_a < 1000 AND doc_b < 1000")
    ordinary_capped = capped.filter("doc_a < 1000 AND doc_b < 1000")
    assert sorted(map(tuple, ordinary.collect())) == sorted(
        map(tuple, ordinary_capped.collect())
    )


def test_semdedup_auto_cells_flat_optimum():
    from flink_etl_spark.operators.knobs import ivf_auto_cells, semdedup_auto_cells

    # k* = sqrt(cost_ratio * n): 2x the ANN sqrt rule at the default
    # calibration, never exceeding n, floor 1
    assert semdedup_auto_cells(50_000) == round((4.0 * 50_000) ** 0.5)
    assert semdedup_auto_cells(50_000) > ivf_auto_cells(50_000)
    assert semdedup_auto_cells(0) == 1
    assert semdedup_auto_cells(3) <= 3
    assert semdedup_auto_cells(10**12) == 65536  # ceiling


def test_semdedup_auto_cells_two_level_optimum():
    from flink_etl_spark.operators.knobs import (
        semdedup_auto_cells,
        semdedup_auto_cells_two_level,
    )

    n = 1_000_000
    k2 = semdedup_auto_cells_two_level(n)
    assert k2 == round((4.0 * n) ** (2.0 / 3.0))
    # more cells than the flat optimum (cheaper assignment affords them)
    assert k2 > semdedup_auto_cells(n)
    assert semdedup_auto_cells_two_level(0) == 1
    assert semdedup_auto_cells_two_level(10**12) == 1 << 20  # ceiling


def test_semdedup_auto_quantizer_crossover():
    from flink_etl_spark.operators.knobs import semdedup_auto_quantizer

    # measured ladder points (docs/SCALING.md): flat wins at 2k,
    # two_level wins at 20k; the default crossover sits between
    assert semdedup_auto_quantizer(2_000) == "flat"
    assert semdedup_auto_quantizer(20_000) == "two_level"
    assert semdedup_auto_quantizer(0) == "flat"
    # explicit crossover override
    assert semdedup_auto_quantizer(100, crossover=50) == "two_level"
