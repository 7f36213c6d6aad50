"""Grouped-map custom operators (applyInPandas).

The third Python-integration shape the engine exercises (beside
mapInPandas in multimodal.py and applyInPandasWithState in
streaming/stateful.py): one pandas DataFrame per GROUP, for per-entity
model fitting / normalization that SQL aggregates cannot express in
general. Arrow-batched; the shuffle is the groupBy hash partition.

Scale: per-group data must fit a worker's memory — grouped-map is for
per-entity work (a user's events), never per-partition work. Groups
are independent, so the stage parallelizes to min(#groups, cores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: output schema of `per_group_linear_fit` for the default bigint
#: user_id — the operator derives the actual schema from the input's
#: `group_col` name and type
FIT_SCHEMA = (
    "user_id bigint, n bigint, slope double, intercept double"
)


def per_group_linear_fit(
    events: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Least-squares fit of value over time per group: the canonical
    per-entity model-fit shape (trend detection, per-user drift).

    x is DAYS since the unix epoch so the slope is in value-per-day
    units (epoch seconds would push slopes below float-rounding
    visibility).

    CROSS-ENGINE EXACTNESS (r12): the moments are accumulated as
    EXACT Python integers (epoch-microsecond x shifted by the group
    minimum; value scaled to its 6-decimal integer grid) — order-
    independent and overflow-free — and only then converted to doubles
    for ONE PINNED IEEE op sequence the DuckDB oracle replicates
    verbatim (SQL CAST(HUGEINT AS DOUBLE) is correctly rounded like
    Python's float(int) — verified). The previous pandas float
    accumulation + round(x, 6) was a last-ulp lottery: two engines'
    differently-ordered float sums flip the 6th decimal whenever the
    true value sits near a rounding boundary (9 of 1500 groups at
    sf0.1), and Python rounds half-even where SQL rounds half-away.
    Final values are micro-FLOORED (no half-edge exists)."""

    def fit(pdf):
        # self-contained closure (executor sys.path — see stateful.py)
        import math

        import pandas as pd

        # SQL regr_* excludes pairs where EITHER side is null; pandas
        # skipna would drop them asymmetrically (y skips, x doesn't),
        # corrupting the moments — drop the pairs up front. n stays
        # count(*) over ALL rows, matching the oracle's count(*)
        clean = pdf[[ts_col, value_col]].dropna()
        xs = clean[ts_col].astype("datetime64[us]").astype("int64").tolist()
        # value is 6-decimal-exact by contract: *1e6 lands within an
        # ulp of its integer, so round() recovers it exactly (never on
        # a half, so the rounding mode cannot matter here)
        ys = [int(round(v * 1e6)) for v in clean[value_col].tolist()]
        slope = intercept = None
        if xs:
            x0 = min(xs)
            xp = [x - x0 for x in xs]
            k = len(xp)
            sx = sum(xp)
            sy = sum(ys)
            sxy = sum(a * b for a, b in zip(xp, ys))
            sxx = sum(a * a for a in xp)
            dn, dsx, dsy, dsxy, dsxx, dx0 = (
                float(k), float(sx), float(sy), float(sxy), float(sxx),
                float(x0),
            )
            d_num = dn * dsxy - dsx * dsy
            d_den = dn * dsxx - dsx * dsx
            if d_den != 0.0:
                # y6-per-us -> natural-y-per-day is x86400e6 / 1e6;
                # the UNITS must match in the intercept too: the
                # subtracted term is (per-DAY slope) x (mean x in
                # DAYS) — dropping the 86400 here once shrank the
                # term 86400x and collapsed intercept to ~mean(y)
                # (caught by review with a hand-computed example,
                # now pinned by test)
                slope_day = d_num * 86400.0 / d_den
                slope = math.floor(slope_day * 1e6) / 1e6
                meanx_day = (dx0 + dsx / dn) / 86400000000.0
                meany = dsy / dn / 1000000.0
                intercept = math.floor(
                    (meany - slope_day * meanx_day) * 1e6
                ) / 1e6
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [len(pdf)],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    # derive the schema from the ACTUAL group column: a hardcoded
    # "user_id bigint" would mislabel renamed keys (columns map
    # positionally) and fail outright for non-bigint key types
    group_ddl = events.schema[group_col].dataType.simpleString()
    schema = f"{group_col} {group_ddl}, n bigint, slope double, intercept double"
    return events.groupBy(group_col).applyInPandas(fit, schema)


def cogroup_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_group_rows: int = 5_000_000,
) -> DataFrame:
    """As-of join via COGROUPED applyInPandas: both sides shuffle by the
    key, each key's two pandas frames meet in one Python call, and
    pandas' merge_asof does the backward lookup.

    Exists as the cogroup reference implementation and a cross-check of
    the native `operators.joins.asof_join` (union + window, pure JVM) —
    the JVM path is the production one; this shape is for when per-key
    logic genuinely needs pandas (model scoring against a feature
    frame, per-entity resampling). Output schema: left columns + right
    non-key columns (nulls where no match).

    SCALE CONSTRAINT: cogrouped-map materializes BOTH sides of a key
    as pandas frames in one worker's memory — a single hot key (one
    user with hundreds of millions of events) OOMs that worker with no
    useful diagnostic. `max_group_rows` turns that failure into a
    clear, named error: any key whose combined frames exceed the cap
    raises with the key and the sizes, telling the caller to route the
    workload to the window-based `asof_join`, which handles hot keys
    at whatever size the shuffle can (it never materializes a key's
    rows in one process).

    Same name constraint as `asof_join`: non-key right columns
    (INCLUDING `right_ts`) must not collide with left columns — a
    shared 'ts' would both duplicate the declared output field and
    make pandas' merge_asof collapse the two key columns into one,
    desyncing the frame from the schema. Null timestamps follow
    `asof_join`'s semantics explicitly (pd.merge_asof would otherwise
    crash the job on NaT keys): null-ts right rows can never be a
    match and are dropped; null-ts left rows pass through unmatched."""
    import pandas as pd

    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"rename overlapping non-key columns first: {sorted(overlap)}"
        )
    l_fields = [(c, left.schema[c].dataType.simpleString()) for c in left.columns]
    r_fields = [
        (c, right.schema[c].dataType.simpleString())
        for c in right.columns
        if c != on
    ]
    out_schema = ", ".join(f"{c} {t}" for c, t in [*l_fields, *r_fields])
    r_cols = [c for c, _ in r_fields]

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as pd  # self-contained closure (executor sys.path)

        if len(lpdf) + len(rpdf) > max_group_rows:
            key_val = (
                lpdf[on].iloc[0] if len(lpdf) else rpdf[on].iloc[0]
            )
            raise ValueError(
                f"cogroup_asof: key {key_val!r} holds "
                f"{len(lpdf)}+{len(rpdf)} rows > max_group_rows="
                f"{max_group_rows}; a hot key this size OOMs the worker "
                "under cogrouped-map — use the window-based "
                "operators.joins.asof_join for this workload"
            )
        if lpdf.empty:
            return pd.DataFrame(columns=[*lpdf.columns, *r_cols])
        # null-ts handling mirrors joins.asof_join: a null-ts right row
        # is never a match (drop); a null-ts left row passes through
        # unmatched. pd.merge_asof raises ValueError on NaT keys.
        l_null = lpdf[lpdf[left_ts].isna()]
        lpdf = lpdf[lpdf[left_ts].notna()].sort_values(left_ts)
        rpdf = rpdf[rpdf[right_ts].notna()]

        def _unmatched(frame):
            out = frame.copy()
            for c in r_cols:
                out[c] = None
            return out

        if lpdf.empty:
            return _unmatched(l_null)
        if rpdf.empty:
            out = _unmatched(lpdf)
        else:
            rpdf = rpdf.drop(columns=[on]).sort_values(right_ts)
            out = pd.merge_asof(
                lpdf, rpdf, left_on=left_ts, right_on=right_ts,
                direction="backward", allow_exact_matches=True,
            )
        if len(l_null):
            out = pd.concat([out, _unmatched(l_null)], ignore_index=True)
        return out

    return (
        left.groupby(on)
        .cogroup(right.groupby(on))
        .applyInPandas(fn, out_schema)
    )
