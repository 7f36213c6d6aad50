"""Deterministic, engine-portable hashing primitives.

Everything here is plain integer arithmetic expressible identically in
Spark SQL and ANSI/DuckDB SQL — no reliance on either engine's built-in
hash() (Spark murmur3 != DuckDB's hash), so oracle checks can replicate
the exact values.

Production note (100 TB): the shingle/token dictionary built by
`vocab_ids` is a distinct + window over the vocabulary. For unbounded
vocabularies swap it for `xxhash64(shingle)` — the LSH math is
unchanged, only oracle-portability is lost. The affine-permutation
MinHash itself is the standard (a*x + b) mod p construction from
Broder '97 (public literature).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: Mersenne prime 2^31-1 — fits in 64-bit products with 31-bit ids
MERSENNE_P = 2_147_483_647

#: fixed affine coefficients (a, b) for up to 16 minhash permutations;
#: arbitrary odd constants < P, hardcoded so oracles can embed them
MINHASH_COEFFS: list[tuple[int, int]] = [
    (1299721, 823117), (2750161, 1299827), (15485863, 32452843),
    (49979687, 67867967), (86028121, 104395301), (122949823, 141650939),
    (160481183, 179424673), (198491317, 217645177), (236887691, 256203161),
    (275604541, 295075147), (314606869, 334214459), (353868013, 373587883),
    (393342739, 413158511), (433024223, 452930459), (472882027, 492876847),
    (512927357, 533000389),
]

#: fixed coefficients for simhash bit hashes (one per bit)
SIMHASH_COEFFS = MINHASH_COEFFS


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokenization — identical to `regexp_split_to_array(text, ' +')`."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " +")


def shingles_expr(tokens: Column, k: int = 3) -> Column:
    """Token k-shingles via a sliding window over the token array:
    transform(sequence(0, n-k), i -> concat_ws(' ', t[i..i+k-1])).
    Empty when the document has < k tokens."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), n - F.lit(k))
    return F.when(n >= k, F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )).otherwise(F.array().cast("array<string>"))


def duckdb_shingles(tokens: str, k: int = 3) -> str:
    """Oracle twin of `shingles_expr` (1-based list indexing in DuckDB)."""
    parts = ", ".join(f"{tokens}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({tokens}) >= {k} THEN "
        f"list_transform(range(1, len({tokens}) - {k} + 2), i -> concat_ws(' ', {parts})) "
        f"ELSE [] END"
    )


def vocab_ids(terms: DataFrame, term_col: str = "term") -> DataFrame:
    """Assign dense integer ids to distinct terms by lexicographic rank.

    Deterministic and replicable in SQL (`dense_rank() OVER (ORDER BY
    term)`), which is what makes minhash/simhash oracle-checkable. The
    global window is a single-partition sort over the *vocabulary* (not
    the corpus) — acceptable up to ~100M distinct terms; beyond that use
    xxhash64 ids (see module docstring).
    """
    w = Window.orderBy(F.col(term_col))
    return terms.select(term_col).distinct().withColumn(
        "term_id", F.dense_rank().over(w)
    )


def affine_hash(x: Column, a: int, b: int, p: int = MERSENNE_P) -> Column:
    """(a*x + b) mod p — the permutation family for MinHash."""
    return (x.cast("long") * F.lit(a) + F.lit(b)) % F.lit(p)
