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

#: output schema of `per_group_linear_fit`
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
    visibility). The closed form (centered covariance / variance) is
    the same formula SQL's regr_slope/regr_intercept use, so a SQL
    engine can oracle-check this operator exactly."""

    def fit(pdf):
        # self-contained closure (executor sys.path — see stateful.py)
        import pandas as pd

        # SQL regr_* excludes pairs where EITHER side is null; pandas
        # skipna would drop them asymmetrically (y skips, x doesn't),
        # corrupting the moments — drop the pairs up front. n stays
        # count(*) over ALL rows, matching the oracle's count(*)
        clean = pdf[[ts_col, value_col]].dropna()
        x = clean[ts_col].astype("datetime64[us]").astype("int64") / 86_400_000_000.0
        y = clean[value_col].astype("float64")
        mx, my = x.mean(), y.mean()
        var = ((x - mx) ** 2).sum()
        if var == 0.0:
            # degenerate fit (single point / constant x): NULL, matching
            # SQL regr_slope semantics (not NaN — engines hash these
            # differently)
            slope = None
            intercept = None
        else:
            raw_slope = ((x - mx) * (y - my)).sum() / var
            slope = round(raw_slope, 6)
            # intercept from the UNROUNDED slope — regr_intercept does
            intercept = round(my - raw_slope * mx, 6)
        return pd.DataFrame(
            {
                "user_id": [pdf[group_col].iloc[0]],
                "n": [len(pdf)],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return events.groupBy(group_col).applyInPandas(fit, FIT_SCHEMA)
