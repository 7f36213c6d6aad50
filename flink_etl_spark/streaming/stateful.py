"""Custom stateful streaming operators (applyInPandasWithState).

The reference's streaming job is stateless record-at-a-time
(HdfsSink.java:55-125); its only stateful logic — latest-record-per-key
compaction — runs as a daily BATCH job (README.md:221-253). These
operators close that gap: the same semantics maintained CONTINUOUSLY on
the stream, plus the sessionization primitive every event pipeline
needs.

Scale design (100 TB / unbounded streams):
* state is partitioned by key across executors (hash shuffle on the
  groupBy key) — per-key state is O(1) for compaction (one row) and
  O(1) for sessions (five scalars), so total state = #distinct keys,
  independent of stream length
* Arrow batches in/out (applyInPandasWithState), no per-row Python
* `dropDuplicatesWithinWatermark` bounds dedup state by event-time
  horizon instead of growing forever (the exact-dedup-on-stream
  tradeoff: dups further apart than the watermark delay can reappear)
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state: first record per key
    wins; state for a key is dropped once the watermark passes its
    event time + delay. Batch equivalent: `dropDuplicates(keys)`."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))


#: output schema of `sessionize_stream` (closed sessions) for the
#: default bigint user_id — the operator derives the actual schema from
#: the input's `user_col` type, so string/other key types work too
SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
#: per-key state: open session accumulator
_SESSION_STATE_SCHEMA = (
    "start long, last long, n int, total double"
)


# NOTE: the state functions below must stay fully self-contained
# (no references to module-level helpers): cloudpickle then ships them
# by value, so executors never need this package importable — the
# driver contract runs with the repo on the driver's sys.path only.


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    timeout_watermark_delay: str | None = None,
) -> DataFrame:
    """Gap-based sessionization as a custom stateful operator: events of
    one user belong to one session while consecutive gaps stay under
    `gap_minutes`; a longer gap CLOSES the session, which is emitted
    downstream.

    Two closing modes:
    * default (NoTimeout): the open tail session stays in state until a
      later event of the same user closes it — deterministic, drainable
      with availableNow, oracle-checkable.
    * `timeout_watermark_delay='10 minutes'`: a watermark is attached
      and an EVENT-TIME TIMEOUT fires once the watermark passes
      session_end + gap, so idle users' sessions close WITHOUT needing
      a successor event — the production mode for unbounded streams
      (also what bounds state size: closed state is removed).

    This is deliberately applyInPandasWithState, not the built-in
    `session_window` aggregation: custom state lets the operator emit
    arbitrary per-session payloads and implement semantics the built-in
    cannot (e.g. timeout flushes, max-length splits, carried session
    attributes).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    use_timeout = timeout_watermark_delay is not None

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # self-contained: see module note

        cols = [user_col, "session_start", "session_end", "n_events",
                "total_value"]

        def emit(rows):
            out = pd.DataFrame(rows, columns=cols)
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            out["total_value"] = out["total_value"].round(6)
            return out

        if use_timeout and state.hasTimedOut:
            # watermark passed session_end + gap with no new events:
            # flush the open session and drop the state
            start, last, n, total = state.get
            state.remove()
            yield emit([(key[0], start, last, n, total)])
            return

        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = None, None, 0, 0.0
        closed: list[tuple[int, int, int, int, float]] = []
        # materialize + sort the WHOLE group's batch before folding:
        # Arrow hands the group as multiple chunks in arbitrary relative
        # order, and sorting each chunk independently would corrupt
        # session assignment whenever a later chunk holds earlier events
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(ts_col)
            # a NULL event time carries no session information and
            # would corrupt state: NaT converts to INT64_MIN, nulling
            # session_start forever and (in timeout mode) crashing the
            # query on a negative timeout timestamp
            pdf = pdf[pdf[ts_col].notna()]
            # normalize datetime64[ns|us] -> epoch micros explicitly
            micros = pdf[ts_col].astype("datetime64[us]").astype("int64")
            for t, v in zip(micros, pdf[value_col]):
                t = int(t)
                # SQL sum semantics: a NULL value contributes 0 to
                # total_value (float(None/NaN) would poison the whole
                # session's accumulator to NaN) while the row still
                # counts toward n_events — count(*), like the oracle
                fv = float(v) if v == v and v is not None else 0.0
                if start is None:
                    start, last, n, total = t, t, 1, fv
                elif t - last > gap_us:
                    closed.append((key[0], start, last, n, total))
                    start, last, n, total = t, t, 1, fv
                else:
                    # monotone bounds: a late cross-batch event (t can
                    # be <= last, or even < start — the per-batch sort
                    # only orders WITHIN a batch) merges into the open
                    # session without regressing it; last = t here
                    # would move session_end backward past events
                    # already counted and make the next gap check close
                    # the session early
                    start = min(start, t)
                    last, n, total = max(last, t), n + 1, total + fv
        if start is not None:
            state.update((start, last, n, total))
            if use_timeout:
                # fire when the event-time watermark passes the gap horizon
                state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield emit(closed)

    if use_timeout:
        events = events.withWatermark(ts_col, timeout_watermark_delay)
    # derive the output schema from the ACTUAL key column: a hardcoded
    # "user_id bigint" would crash (or silently mislabel — columns map
    # positionally) for renamed or non-bigint keys
    user_ddl = events.schema[user_col].dataType.simpleString()
    out_schema = (
        f"{user_col} {user_ddl}, session_start timestamp, "
        "session_end timestamp, n_events bigint, total_value double"
    )
    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


#: output schema of `cdc_compact_stream`
COMPACT_SCHEMA = (
    "id bigint, es bigint, ts bigint, type string, city string, province string"
)
_COMPACT_STATE_SCHEMA = COMPACT_SCHEMA


def cdc_compact_stream(changes: DataFrame) -> DataFrame:
    """The reference's daily latest-per-key compaction (row_number over
    (id ORDER BY event_time DESC), README.md:244-251) as a CONTINUOUS
    operator: per-key state holds the current latest record; each
    micro-batch emits the keys whose latest record changed — a streaming
    materialized view of the snapshot table.

    Ordering matches operators/merge.dedup_latest: (es DESC, ts DESC).
    Input schema: the flattened Canal row (id, es, ts, type, payload...).
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = ["id", "es", "ts", "type", "city", "province"]

        def order_key(rec: tuple) -> tuple:
            # null es/ts (a missing Canal envelope field flattens to
            # None/NaN) must not TypeError against ints: treat missing
            # as -inf so any real timestamp wins, matching SQL's
            # NULLS LAST under DESC ordering in the batch dedup
            def k(v):
                return float("-inf") if v is None or v != v else v

            return (k(rec[1]), k(rec[2]))

        prev = tuple(state.get) if state.exists else None
        best = prev
        for pdf in pdfs:
            for row in pdf[cols].itertuples(index=False):
                cand = tuple(row)
                if best is None or order_key(cand) > order_key(best):
                    best = cand
        if best is not None and best != prev:
            state.update(best)
            yield pd.DataFrame([best], columns=cols)

    return changes.groupBy("id").applyInPandasWithState(
        fn,
        outputStructType=COMPACT_SCHEMA,
        stateStructType=_COMPACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
