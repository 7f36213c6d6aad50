"""Stream-stream event-time joins (extension surface, SURVEY.md §2.12).

The reference has no streaming joins (its only join is the batch Hive
merge, README.md:221-253); this is the Structured Streaming capability
that replaces Flink's DataStream interval join
(KeyedStream.intervalJoin in the public Flink API): two live streams,
each watermarked, joined on equi-keys PLUS an event-time band, with
state for both sides retained only inside the watermark horizon.

Spark's engine requirements (enforced here, not left to runtime
AnalysisExceptions): both sides carry a watermark, and the join
condition constrains BOTH event-time columns — that pair is exactly
what lets the engine compute how long each side's buffered rows can
possibly still match, i.e. bounded state at unbounded input.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "1 HOUR",
    upper: str = "0 SECONDS",
    watermark_delay: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Join right-stream rows to left-stream rows with the same `on`
    keys and `right_ts` in (left_ts - lower, left_ts + upper] — the
    same band contract as the batch `operators.joins.interval_join`,
    so the two are directly batch-equivalence-testable (and are, in
    tests/test_stateful.py).

    State bound: a buffered left row can match rights up to
    `left_ts + upper`; a buffered right row can match lefts up to
    `right_ts + lower`. With both sides watermarked at
    `watermark_delay`, the engine evicts each row once the other
    side's watermark passes that horizon — total state is
    O(rate x (watermark_delay + band width)), independent of stream
    lifetime.

    `join_type`: "inner" emits matches as they arrive (micro-batch
    boundaries never change the result set, only its timing);
    "left_outer" additionally emits null-padded left rows, but only
    once the watermark PROVES no match can still arrive — an outer row
    whose band is not yet past the watermark is withheld, so a drained
    (availableNow) run emits outer rows only for lefts older than the
    final watermark. Oracle/gate arms therefore pin "inner"; the
    outer semantics are exercised in tests.

    `left_ts` and `right_ts` may share a name (the join condition uses
    DataFrame-qualified refs); the joined frame then carries both
    columns under that name — rename one beforehand if downstream code
    selects it by string."""
    if join_type not in ("inner", "left_outer"):
        raise ValueError(f"join_type must be inner or left_outer, got {join_type!r}")
    # dataset ALIASES, not bracket refs: both sides commonly derive
    # from the same source stream (filter fan-out of one events
    # stream), where lw[col]/rw[col] hit Spark's ambiguous-self-join
    # check because the attribute ids are shared; alias-qualified
    # names are the documented disambiguation and also allow
    # left_ts == right_ts (both sides carrying "ts"), matching the
    # batch interval_join's contract
    lw = left.withWatermark(left_ts, watermark_delay).alias("__sij_l")
    rw = right.withWatermark(right_ts, watermark_delay).alias("__sij_r")
    lt = F.col(f"__sij_l.{left_ts}")
    rt = F.col(f"__sij_r.{right_ts}")
    cond: Column = (
        (rt > lt - F.expr(f"INTERVAL {lower}"))
        & (rt <= lt + F.expr(f"INTERVAL {upper}"))
    )
    for k in on:
        cond = cond & (F.col(f"__sij_l.{k}") == F.col(f"__sij_r.{k}"))
    joined = lw.join(rw, cond, join_type)
    # drop the right side's copy of the equi-keys (they equal the
    # left's for inner rows and are NULL on outer rows — same
    # projection the batch interval_join produces)
    for k in on:
        joined = joined.drop(F.col(f"__sij_r.{k}"))
    return joined
