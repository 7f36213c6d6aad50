"""Data-derived sizing for LSH-family knobs.

The sketch operators (SimHash width, sign-LSH plane count, IVF cell
count, MinHash banding) all have a corpus-size-dependent sweet spot,
and a fixed default silently degrades off-scale: the 5x stress probe
(docs/SCALING.md) measured a 16-bit SimHash birthday-colliding 18M
accidental pairs at 25k docs, and a 4-plane LSH taking 139s at 10k
vectors. These functions derive each knob from a cheap corpus count so
no per-corpus hand tuning is needed; every operator still accepts an
explicit integer (the deterministic override the oracle gates pin, and
the escape hatch for callers who know better).

All functions are pure and deterministic — same count in, same knob
out — so a staged index or profile built with auto knobs is
reproducible. The only runtime cost of "auto" is one column-pruned
`count()` of the corpus (callers that already know the count pass it
via `n_docs=`/`n_vecs=` and pay nothing).
"""

from __future__ import annotations

from math import comb, log2, sqrt


def simhash_auto_bits(
    n_docs: int, max_hamming: int = 2, budget: float = 1.0,
    margin_bits: int = 8,
) -> int:
    """Smallest signature width in [16, 63] whose EXPECTED accidental
    pair count at Hamming <= max_hamming stays under `budget` pairs
    (absolute, default 1) for unrelated documents, PLUS a measured
    correlation safety margin of `margin_bits`.

    Model: unrelated docs get independent uniform signatures, so
    P(hamming <= h) = sum_{i<=h} C(bits, i) / 2^bits and the expected
    accidental pairs are C(n, 2) * P. The birthday failure mode is
    quadratic in n — width must grow ~2*log2(n), which is exactly what
    solving the inequality produces. 63 is the hard ceiling (bit 63
    would be the LONG sign bit).

    The uniform model is a FLOOR, not the answer: a real corpus's
    signatures are correlated (documents share vocabulary), so the
    near-miss tail — moderately-similar pairs drifting under the
    Hamming threshold — runs orders of magnitude above the uniform
    budget at the solved width, and is hash-dependent as well as
    width-dependent (5x stress corpus, 25k docs, uniform-solved 38
    bits: 284k Hamming<=2 pairs under charfold, 1.04M under the
    xxhash64 default — vs the <= 1 uniform expectation). Every extra
    bit shrinks the measured tail ~2x while costing only one more
    vote aggregate (linear), so the margin errs wide by default;
    `margin_bits=0` recovers the bare uniform solution. The margin is
    applied before the 63-bit ceiling and keeps the width monotone in
    the corpus size."""
    n = max(int(n_docs), 2)
    for bits in range(16, 64):
        ways = sum(comb(bits, i) for i in range(max_hamming + 1))
        expected = (n * (n - 1) / 2) * (ways / float(1 << bits))
        if expected <= budget:
            return min(63, bits + margin_bits)
    return 63


def signlsh_auto_planes(n_vecs: int, target_bucket: int = 32) -> int:
    """Plane count giving ~`target_bucket` vectors per bucket:
    ceil(log2(n / target_bucket)), clamped to [2, 24].

    Too few planes -> buckets hold O(n) vectors and the bucket join
    degenerates toward all-pairs (the measured 139s case); too many ->
    buckets hold ~1 vector and recall collapses. n/2^planes ~ 32 keeps
    candidate volume ~32 per probe independent of corpus size."""
    from math import ceil

    n = max(int(n_vecs), 2)
    return max(2, min(24, ceil(log2(max(n / max(target_bucket, 1), 2.0)))))


def ivf_auto_cells(n_vecs: int) -> int:
    """Cell count ~ sqrt(n), clamped to [4, 65536] and to n — the
    standard IVF balance: probe cost per query is
    n/cells * nprobe + cells (centroid scan); sqrt(n) minimizes the
    sum, giving O(sqrt(n)) work per query either side. The floor is
    min(4, n) so a degenerate corpus (n < 4) never asks for more cells
    than vectors."""
    n = max(int(n_vecs), 1)
    return max(min(4, n), min(65536, n, round(sqrt(n))))


def semdedup_auto_cells(n_vecs: int, cost_ratio: float = 4.0) -> int:
    """Cell count for cluster-then-dedup (SemDeDup), minimizing the
    FLAT-quantizer total cost  c_a * n * k  (assignment: every vector
    scores every broadcast centroid)  +  c_p * n^2 / k  (within-cell
    pair work, balanced cells):  k* = sqrt(c_p/c_a * n).

    Two wrong answers this replaces, both measured on the 10x replica:
    * constant occupancy (k = n/128) makes PAIR work linear but
      assignment n^2/128 — quadratic, the eventual scale-killer;
    * the bare ANN sqrt(n) (`ivf_auto_cells`) ignores that a verify
      pair (shuffle join + array struct compare) costs ~4x an
      assignment sim (codegen broadcast arithmetic), sitting 2x off
      the optimum (11.3s vs 8.6s at 50k vectors).
    `cost_ratio` is that measured c_p/c_a. The optimum is flat-design
    O(n^1.5) total — the same asymptotic SemDeDup itself accepts for
    one-level k-means; below it requires a hierarchical quantizer.
    Clamped to [1, 65536] and to n."""
    n = max(int(n_vecs), 1)
    return max(1, min(65536, n, round(sqrt(max(cost_ratio, 0.01) * n))))


def semdedup_auto_cells_two_level(n_vecs: int, cost_ratio: float = 4.0) -> int:
    """Cell count for SemDeDup's TWO-LEVEL quantizer: with assignment
    at ~2*sqrt(k) sims per vector (`ivf_assign_two_level`), minimizing
    c_a * 2n*sqrt(k) + c_p * n^2/k gives k* = ((c_p/c_a) * n)^(2/3) —
    more cells than the flat optimum's sqrt, and total cost O(n^(4/3))
    instead of O(n^1.5). Clamped to [1, 2^20] and to n."""
    n = max(int(n_vecs), 1)
    return max(1, min(1 << 20, n, round((max(cost_ratio, 0.01) * n) ** (2.0 / 3.0))))


def semdedup_auto_quantizer(n_vecs: int, crossover: int = 8192) -> str:
    """Pick the SemDeDup assignment architecture from the corpus size.

    The two-level quantizer's asymptotic win (O(n^(4/3)) total vs the
    flat arm's O(n^1.5)) is bought with constant per-job overhead the
    flat arm doesn't pay: an extra corpus persist, a per-coarse-cell
    seed window, and a second ranking window. Below a few thousand
    vectors that overhead dominates the asymptotic saving — measured on
    the replica ladder (docs/SCALING.md): at 2k vectors (sf0.1) flat
    runs ~20% faster end-to-end, at 20k (the 10x replica) two-level is
    ~28% faster with the gap widening in n. `crossover` is the measured
    break-even neighborhood (default 8192, between those two points);
    the exact value matters little because both arms are within ~25% of
    each other for an order of magnitude around it."""
    return "flat" if max(int(n_vecs), 1) < crossover else "two_level"


def minhash_auto_bands(
    threshold: float, n_hashes: int = 16, fp_weight: float = 0.2
) -> int:
    """Band count (a divisor of n_hashes) minimizing the weighted
    false-positive + false-negative probability mass of the LSH S-curve
    P(candidate | jaccard=s) = 1 - (1 - s^r)^b around `threshold` —
    the public datasketch/MinHashLSH optimization, evaluated on a fixed
    deterministic grid.

    `fp_weight` defaults LOW (0.2): these pipelines always verify
    candidates with exact Jaccard, so a false positive costs one
    array_intersect while a false negative is a silently-missed
    duplicate."""
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    divisors = [b for b in range(1, n_hashes + 1) if n_hashes % b == 0]
    steps = 200
    best_b, best_err = divisors[0], float("inf")
    for b in divisors:
        r = n_hashes // b
        fp = fn = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s**r) ** b
            if s < threshold:
                fp += p / steps
            else:
                fn += (1.0 - p) / steps
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if err < best_err:
            best_b, best_err = b, err
    return best_b


def resolve_knob(value: int | str, auto_fn, df, n_rows: int | None, *args) -> int:
    """Resolve an `int | "auto"` knob: integers pass through untouched
    (the deterministic override), "auto" derives from `n_rows` or — if
    the caller didn't supply it — one column-pruned count() of `df`."""
    if value == "auto":
        n = n_rows if n_rows is not None else df.count()
        return auto_fn(n, *args)
    if not isinstance(value, int):
        raise ValueError(f"knob must be an int or 'auto', got {value!r}")
    return value
