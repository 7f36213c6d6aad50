"""Temporal and skew-aware join operators.

The reference's only join is the CDC full-outer merge
(README.md:230,252 -> operators/merge.py). These are the extension
joins a large-scale event/training-data pipeline needs:

* as-of join   — "latest right row at-or-before each left row" per key;
                 the point-in-time lookup behind feature backfills
* interval join — right rows within a time window around each left row
* salted join  — equi-join with a skewed build side spread over salt
                 buckets (AQE skew-split handles moderate skew; salting
                 is the explicit fix for pathological single-key skew)

Scale design (100 TB):
* as-of is NOT a range join: the union-marker implementation below is
  one hash shuffle + one sort over (key, ts) — the same cost as a
  single window function — instead of an O(|L| * |R|-per-key) range
  explosion followed by a per-left-row argmax.
* interval joins ARE range joins; the equi-key keeps the shuffle
  hash-partitioned so each task only range-scans its own key group.
* both inherit AQE partition coalescing / skew splitting from the
  session defaults.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tie_break: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: for every left row, attach the right row with the
    greatest `right_ts` satisfying `right_ts <= left_ts` (or `<` when
    `strict`) within the same `on` key group; left rows with no match
    keep nulls (LEFT semantics, matching DuckDB `ASOF LEFT JOIN`).

    Implementation: tag both sides, union by name, then one window pass
    ordered by (ts, side-marker) carrying the last right ROW forward —
    a single shuffle on `on` + sort, no range join, no per-key
    explosion. At 100 TB this is the difference between a window-shaped
    plan and a quadratic candidate join.

    The right columns are packed into ONE struct before the window fill
    so the match is atomic: filling each column independently with
    last(ignorenulls) would stitch together attributes from DIFFERENT
    right rows whenever the true match has a null column.

    Requirements: non-key column names must not overlap between sides
    (rename before calling); `tie_break` (a right-side column) makes the
    choice among right rows sharing (key, ts) deterministic.

    NULL join keys never match (same as the equi-join and DuckDB ASOF
    semantics this mirrors): right rows with a null key are excluded
    before the union — without that, Window.partitionBy would group
    all null-key rows of BOTH sides into one partition and fabricate
    matches a join would never produce. Null-key left rows pass
    through with null match columns.
    """
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(f"rename overlapping non-key columns first: {sorted(overlap)}")
    for k in on:
        right = right.filter(F.col(k).isNotNull())

    # side marker: the right row at ts == left ts must sort BEFORE the
    # left row to be visible in its frame (<=), or AFTER to be hidden (<)
    l_kind, r_kind = (0, 1) if strict else (1, 0)
    right_cols = [c for c in right.columns if c not in on]
    lhs = left.withColumn("_ats", F.col(left_ts)).withColumn("_kind", F.lit(l_kind))
    rhs = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(r_kind).alias("_kind"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    )
    combined = lhs.unionByName(rhs, allowMissingColumns=True)

    order: list[Column] = [F.col("_ats").asc(), F.col("_kind").asc()]
    if tie_break is not None:
        order.append(F.col("_rrow").getField(tie_break).asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_match")
    )
    return (
        filled.filter(F.col("_kind") == l_kind)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col("_match").getField(c).alias(c) for c in right_cols],
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    salt_buckets: int | None = None,
    spread_duplicates: bool = True,
) -> DataFrame:
    """Left interval join: right rows with
    `left_ts - lower < right_ts <= left_ts + upper` in the same key
    group (`lower`/`upper` are SQL interval literals, e.g. '1 HOUR';
    use '0 SECONDS' for a one-sided window).

    The equi-key dominates the plan: Catalyst shuffles both sides by
    `on` and applies the range predicate inside each key group, so cost
    is per-key-group, not |L| x |R|.

    SKEW: within one key group the range scan is O(|L_k| * |R_k|) —
    standard for interval joins and fine at normal cardinalities, but a
    single pathological key (one user producing millions of events)
    concentrates quadratic work in one task, and AQE's skew splitting
    cannot help: it splits by partition size BEFORE the range predicate
    runs. `salt_buckets=B` applies the `salted_join` pre-split to this
    join: the left side salts by row hash, the right side replicates B
    ways, and the join key becomes (key, salt) — each hot-key task then
    scans |L_k|/B x |R_k| with identical output (every left row still
    sees its full right key group exactly once, and LEFT semantics are
    preserved because unmatched rows can only surface from the
    unsalted-in-effect left side)."""
    out_left_cols = list(left.columns)
    out_right_cols = [c for c in right.columns if c not in on]
    join_keys = list(on)
    if salt_buckets:
        # shared recipe with salted_join; the replicated side is the
        # RIGHT, so right/full joins would dup — this operator is
        # left-only, which is exactly the safe case
        left, right = _salt_pair(left, right, salt_buckets, spread_duplicates)
        join_keys.append("_salt")
    # explicit aliases: both sides often derive from the same scan
    # (self-join on an events table) — name-based resolution via the
    # aliases sidesteps ambiguous-lineage column references
    l, r = left.alias("_l"), right.alias("_r")
    cond = F.lit(True)
    for c in join_keys:
        cond = cond & (F.col(f"_l.{c}") == F.col(f"_r.{c}"))
    lts = F.col(f"_l.{left_ts}")
    rts = F.col(f"_r.{right_ts}")
    cond = (
        cond
        & (rts > lts - F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "left").select(
        *[F.col(f"_l.{c}") for c in out_left_cols],
        *[F.col(f"_r.{c}") for c in out_right_cols],
    )


def _salt_pair(
    skewed: DataFrame,
    other: DataFrame,
    salt_buckets: int,
    spread_duplicates: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The one salting recipe (shared by salted_join and
    interval_join): `skewed` gains a `_salt` bucket, `other` is
    replicated once per bucket.

    `spread_duplicates=True` (default) hashes the full row PLUS
    `monotonically_increasing_id()`: a pure row-content hash sends
    byte-identical duplicate rows of a hot key all to ONE bucket —
    precisely the duplicate-heavy workload salting exists for. The id
    is an extra xxhash64 input (not an addition — summing could
    overflow a BIGINT under ANSI mode). Join RESULTS stay deterministic
    (every left row still meets its full right key group exactly once);
    only the bucket ASSIGNMENT depends on partition layout.

    The tradeoff: the id makes the salted map stage INDETERMINATE to
    the scheduler — after a shuffle-fetch failure Spark must roll back
    and recompute the whole stage (it cannot trust already-fetched
    outputs), and a partially-committed result stage can abort the job.
    Pass `spread_duplicates=False` for a pure row-content hash:
    deterministic map output (cheap, surgical retries) at the cost of
    byte-identical duplicates sharing a bucket. Choose by workload:
    heavy exact-duplicate skew -> True; mostly-distinct rows on a hot
    key (the common case) -> False loses nothing."""
    cols = [F.col(c) for c in skewed.columns]
    if spread_duplicates:
        cols.append(F.monotonically_increasing_id())
    salt = F.pmod(F.xxhash64(*cols), F.lit(salt_buckets))
    s = skewed.withColumn("_salt", salt.cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return s, o


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
    spread_duplicates: bool = True,
) -> DataFrame:
    """Equi-join where `skewed` has pathological key skew: spread each
    hot key over `salt_buckets` partitions (row-hash, plus a per-row id
    when `spread_duplicates` — see `_salt_pair` for the determinism
    tradeoff), replicate `other` once per bucket, and join on
    (key, salt). Join results are reproducible and oracle-checkable;
    the salt assignment itself may differ between runs, which the
    results never expose.

    Use when AQE skew-splitting is not enough (a single key larger than
    an executor); salting trades `salt_buckets`-way duplication of the
    small side for even task sizes on the big side.

    Only join types where an unmatched `other` row CANNOT surface are
    supported: with right/full-outer, each unmatched `other` row would
    appear once per salt bucket (it was exploded salt_buckets times),
    silently multiplying the output."""
    supported = {"inner", "left", "left_outer", "leftouter", "left_semi",
                 "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower() not in supported:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated small "
            f"side would duplicate unmatched rows {salt_buckets}x under "
            f"right/full joins; use one of {sorted(supported)}"
        )
    s, o = _salt_pair(skewed, other, salt_buckets, spread_duplicates)
    return s.join(o, [*on, "_salt"], how).drop("_salt")
