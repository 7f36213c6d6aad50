"""Time-bucket gap filling — the TimescaleDB `time_bucket_gapfill` /
`locf()` / `interpolate()` analogue over event tables: aggregate into
fixed buckets, then MATERIALIZE the empty buckets so downstream
consumers (charting, anomaly detection, training-feature windows) see
a dense, regular series instead of silently missing rows.

Composes with the rest of the temporal family: `catalog/cdc.py`'s
window gates aggregate, `streaming/merge_sink.py` maintains rollups
continuously; this fills the holes either leaves when a bucket simply
has no events.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: supported fill strategies for the value column
FILLS = ("null", "locf", "linear")


def gapfill_time_buckets(
    events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] | list[str] = ("event_type",),
    agg: Column | None = None,
    agg_name: str = "sum_value",
    fill: str = "locf",
) -> DataFrame:
    """Bucket `events` into fixed `bucket` windows per group, then fill
    every missing bucket between each GROUP's first and last observed
    bucket. Output: group cols + ``window_start`` + ``n_events``
    (0 for gap rows) + the aggregate column, filled per ``fill``:

    * ``"null"`` — gap rows carry NULL (Timescale's bare gapfill);
    * ``"locf"`` — last observed value carried forward (`locf()`);
    * ``"linear"`` — linear interpolation between the surrounding
      observed buckets (`interpolate()`); leading gaps (nothing
      before) stay NULL, trailing gaps cannot exist (the spine ends
      at the group's last OBSERVED bucket).

    The spine is generated ROW-LOCALLY: one (min, max) aggregate per
    group, then `sequence(lo, hi, interval)` exploded — no driver
    ranges, no cross join, and a group's spine length is bounded by
    its own observed span. Scale shape: the bucket aggregate is
    map-side combined; the spine join is group+bucket equi-keyed; the
    fills are one window per group ordered by bucket (LOCF a running
    last-ignore-nulls; linear additionally a forward window for the
    next observed point). Determinism: no floating aggregation is
    introduced beyond the caller's `agg`; LOCF copies values
    verbatim, and linear interpolation is one fixed-form expression.

    `agg` defaults to `exact_decimal_sum(value, 6)` — the engine's
    order-independent decimal sum (see catalog/__init__ rules)."""
    if fill not in FILLS:
        raise ValueError(f"fill must be one of {FILLS}, got {fill!r}")
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    if agg is None:
        from flink_etl_spark.catalog import exact_decimal_sum

        agg = exact_decimal_sum(F.col("value"), 6)

    b = F.window(F.col(ts_col), bucket).getField("start")
    agged = events.groupBy(
        b.alias("window_start"), *[F.col(c) for c in group_cols]
    ).agg(F.count("*").alias("n_events"), agg.alias(agg_name))

    span = agged.groupBy(*group_cols).agg(
        F.min("window_start").alias("_lo"), F.max("window_start").alias("_hi")
    )
    spine = span.select(
        *group_cols,
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {bucket}")
            )
        ).alias("window_start"),
    )
    dense = spine.join(agged, [*group_cols, "window_start"], "left").select(
        *group_cols,
        "window_start",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.col(agg_name),
    )
    if fill == "null":
        return dense

    w_back = (
        Window.partitionBy(*group_cols)
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if fill == "locf":
        return dense.withColumn(
            agg_name, F.last(agg_name, ignorenulls=True).over(w_back)
        )

    # linear: y = prev + (next - prev) * (t - t_prev) / (t_next - t_prev),
    # with bucket positions as the time axis (equal spacing, so the
    # fraction is a ratio of bucket counts — exact small integers)
    w_fwd = (
        Window.partitionBy(*group_cols)
        .orderBy("window_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pos = F.row_number().over(
        Window.partitionBy(*group_cols).orderBy("window_start")
    )
    with_pos = dense.withColumn("_pos", pos)
    obs_pos = F.when(F.col(agg_name).isNotNull(), F.col("_pos"))
    prev_v = F.last(agg_name, ignorenulls=True).over(w_back)
    prev_p = F.last(obs_pos, ignorenulls=True).over(w_back)
    next_v = F.first(agg_name, ignorenulls=True).over(w_fwd)
    next_p = F.first(obs_pos, ignorenulls=True).over(w_fwd)
    interp = F.when(F.col(agg_name).isNotNull(), F.col(agg_name)).otherwise(
        prev_v
        + (next_v - prev_v)
        * ((F.col("_pos") - prev_p) / (next_p - prev_p))
    )
    return with_pos.withColumn(agg_name, interp).drop("_pos")
