"""Unit tests for CDC compaction + merge (SURVEY.md §5.1/§5.5)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_etl_spark.operators import merge


def _snapshot(spark):
    return spark.createDataFrame(
        [(1, "bj", "bj", 100), (2, "sh", "sh", 100), (3, "gz", "gd", 100)],
        ["id", "city", "province", "event_time"],
    )


def _delta(spark):
    # key 2 updated twice (latest wins), key 4 inserted, key 3 untouched,
    # key 1 deleted (reference semantics: DELETE row still merges in)
    return spark.createDataFrame(
        [
            (2, "sh2", "sh", 200, "UPDATE", 201),
            (2, "sh3", "sh", 300, "UPDATE", 301),
            (4, "sz", "gd", 250, "INSERT", 251),
            (1, "bj", "bj", 400, "DELETE", 401),
        ],
        ["id", "city", "province", "event_time", "type", "ts"],
    )


def test_dedup_latest_picks_newest(spark):
    latest = merge.dedup_latest(_delta(spark), keys=["id"])
    got = {r.id: r.city for r in latest.collect()}
    assert got == {1: "bj", 2: "sh3", 4: "sz"}


def test_dedup_latest_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a", 100, 1), (1, "b", 100, 2)], ["id", "v", "event_time", "ts"]
    )
    # same event_time -> ts breaks the tie (non-strict mode)
    assert merge.dedup_latest(df, keys=["id"]).first().v == "b"


def test_dedup_latest_requires_recency_column(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    with pytest.raises(ValueError):
        merge.dedup_latest(df, keys=["id"])


def test_cdc_merge_insert_update_untouched_delete(spark):
    latest = merge.dedup_latest(_delta(spark), keys=["id"])
    out = merge.cdc_merge(
        _snapshot(spark), latest, keys=["id"],
        columns=["id", "city", "province", "event_time"],
    )
    got = {r.id: (r.city, r.event_time) for r in out.collect()}
    assert got == {
        1: ("bj", 400),   # DELETE carried through (reference bug-compat)
        2: ("sh3", 300),  # latest update wins
        3: ("gz", 100),   # untouched -> snapshot value
        4: ("sz", 250),   # insert from delta only
    }


def test_cdc_merge_drop_deletes_extension(spark):
    latest = merge.dedup_latest(_delta(spark), keys=["id"])
    out = merge.cdc_merge(
        _snapshot(spark), latest, keys=["id"],
        columns=["id", "city", "province", "event_time"],
        drop_deletes=True,
    )
    assert sorted(r.id for r in out.collect()) == [2, 3, 4]


def test_cdc_merge_rejects_bad_keys(spark):
    with pytest.raises(ValueError):
        merge.cdc_merge(
            _snapshot(spark), _delta(spark), keys=["id"], columns=["city"]
        )


def test_merge_day_prunes_partition(spark):
    delta = _delta(spark).withColumn(
        "dt", F.when(F.col("id") == 4, "20240102").otherwise("20240101")
    )
    out = merge.merge_day(
        _snapshot(spark), delta, day="20240102", keys=["id"],
        columns=["id", "city", "province", "event_time"],
    )
    got = {r.id: r.city for r in out.collect()}
    # only key 4's insert applies; snapshot rows pass through
    assert got == {1: "bj", 2: "sh", 3: "gz", 4: "sz"}


def test_merge_replays_history_property(spark):
    """merge(snapshot, delta) == replay of the full change history
    (SURVEY.md §5.5) on a generated history."""
    import random

    rng = random.Random(42)
    history = []
    t = 0
    for _ in range(300):
        t += 1
        key = rng.randint(1, 20)
        history.append((key, f"v{t}", "x", t, "UPDATE" if rng.random() < 0.8 else "INSERT", t))
    cut = 200
    snap_src = spark.createDataFrame(history[:cut], ["id", "city", "province", "event_time", "type", "ts"])
    snapshot = merge.dedup_latest(snap_src, keys=["id"]).drop("type", "ts")
    delta = spark.createDataFrame(history[cut:], ["id", "city", "province", "event_time", "type", "ts"])
    merged = merge.cdc_merge(
        snapshot, merge.dedup_latest(delta, keys=["id"]),
        keys=["id"], columns=["id", "city", "province", "event_time"],
    )
    full = spark.createDataFrame(history, ["id", "city", "province", "event_time", "type", "ts"])
    replayed = merge.dedup_latest(full, keys=["id"]).select("id", "city", "province", "event_time")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, replayed.collect()))


def test_cdc_merge_schema_evolution(spark):
    """evolve=True: a column added upstream appears (null for old
    snapshot rows); a dropped column survives from the snapshot side."""
    from flink_etl_spark.operators.merge import cdc_merge

    snapshot = spark.createDataFrame(
        [(1, "a", "legacy1"), (2, "b", "legacy2")],
        "id long, v string, old_col string",
    )
    delta = spark.createDataFrame(
        [(2, "b2", "new2"), (3, "c", "new3")],
        "id long, v string, new_col string",
    )
    out = cdc_merge(snapshot, delta, ["id"], evolve=True)
    assert out.columns == ["id", "v", "old_col", "new_col"]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].old_col == "legacy1" and rows[1].new_col is None
    assert rows[2].v == "b2" and rows[2].old_col == "legacy2" and rows[2].new_col == "new2"
    assert rows[3].old_col is None and rows[3].new_col == "new3"
    # default (intersection) mode unchanged
    strict = cdc_merge(snapshot, delta, ["id"])
    assert strict.columns == ["id", "v"]
