"""Vector column expressions over ARRAY<FLOAT> embedding columns.

All math is forced to DOUBLE and summed sequentially (left-to-right
array order) inside the JVM via higher-order functions — no Python UDFs
in the hot path, and deterministic enough to hash-match an oracle that
does the same (rounding applied at the query edge, never mid-pipeline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double(col: Column | str) -> Column:
    """ARRAY<FLOAT> -> ARRAY<DOUBLE>, so all downstream arithmetic is
    double-precision (float accumulation drifts too much to oracle)."""
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential dot product: aggregate(zip_with(a,b,*), 0.0, +)."""
    prods = F.zip_with(
        to_double(a), to_double(b), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision; caller rounds at the edge.
    NULL (not NaN) when either vector has zero norm — see `safe_cosine`."""
    return safe_cosine(dot(a, b), norm(a), norm(b))


def safe_cosine(dot_col: Column, na: Column, nb: Column) -> Column:
    """dot/(na*nb) with a zero-norm guard: the result is NULL, never
    NaN, when either norm is zero. The guard is load-bearing for every
    consumer: Spark orders NaN ABOVE all doubles, so an unguarded
    zero-norm vector (in-domain — `l2_normalize` passes them through)
    would rank FIRST in every cosine top-k and satisfy every
    `cos_sim >= threshold` near-dup filter (NaN >= x is true). NULL
    does the right thing in both: desc ordering puts nulls last, and
    NULL >= threshold filters false."""
    denom = na * nb
    return F.when(denom != F.lit(0.0), dot_col / denom)


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an embedding (zero vectors pass through unchanged
    rather than dividing by zero)."""
    n = norm(a)
    return F.when(
        n == 0, to_double(a)
    ).otherwise(F.transform(to_double(a), lambda x: x / n))


def duckdb_dot(a: str, b: str) -> str:
    """The oracle-side twin of `dot` (same order, same precision)."""
    return (
        f"list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
        f" p -> p[1] * p[2]))"
    )


def duckdb_cosine(a: str, b: str) -> str:
    return (
        f"({duckdb_dot(a, b)} / "
        f"(sqrt({duckdb_dot(a, a)}) * sqrt({duckdb_dot(b, b)})))"
    )
