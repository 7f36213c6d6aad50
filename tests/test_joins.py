"""Unit tests for temporal/skew joins (operators/joins.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
import pyspark.sql.functions as F

from flink_etl_spark.operators.joins import asof_join, interval_join, salted_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:03"), 100.0),
            ("A", _ts("2024-01-01T10:00:10"), 101.0),
            ("B", _ts("2024-01-01T10:00:05"), 50.0),
            ("C", _ts("2024-01-01T10:00:01"), 7.0),  # no quote ever
        ],
        "sym string, t_ts timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:01"), 99.5),
            ("A", _ts("2024-01-01T10:00:03"), 99.9),  # == trade ts
            ("A", _ts("2024-01-01T10:00:08"), 100.5),
            ("B", _ts("2024-01-01T10:00:09"), 49.0),  # after B's only trade
        ],
        "sym string, q_ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_inclusive(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t_ts", right_ts="q_ts"
    )
    rows = {(r.sym, r.px): (r.bid, r.q_ts) for r in out.collect()}
    assert len(rows) == 4  # every left row survives (LEFT semantics)
    assert rows[("A", 100.0)][0] == 99.9  # equal-ts quote IS visible
    assert rows[("A", 101.0)][0] == 100.5  # latest at-or-before 10:00:10
    assert rows[("B", 50.0)] == (None, None)  # only later quotes exist
    assert rows[("C", 7.0)] == (None, None)  # key absent on right


def test_asof_strict_excludes_equal_ts(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t_ts", right_ts="q_ts", strict=True
    )
    rows = {(r.sym, r.px): r.bid for r in out.collect()}
    assert rows[("A", 100.0)] == 99.5  # 10:00:03 quote now hidden


def test_asof_rejects_column_overlap(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="rename overlapping"):
        asof_join(
            trades.withColumnRenamed("px", "bid"), quotes,
            on=["sym"], left_ts="t_ts", right_ts="q_ts",
        )


def test_interval_join_window_bounds(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = interval_join(
        trades, quotes, on=["sym"], left_ts="t_ts", right_ts="q_ts",
        lower="5 SECONDS", upper="0 SECONDS",
    )
    got = {
        (r.sym, r.px, r.bid)
        for r in out.collect()
    }
    # A@3s window (-5s,0]: quotes at 1s,3s; A@10s: quotes at 8s (5s is
    # outside: 10-5=5 exclusive lower bound)
    assert got == {
        ("A", 100.0, 99.5),
        ("A", 100.0, 99.9),
        ("A", 101.0, 100.5),
        ("B", 50.0, None),
        ("C", 7.0, None),
    }


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "z")], "k long, name string"
    )
    plain = big.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(big, dim, on=["k"], salt_buckets=8).groupBy(
        "k", "name"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_interval_join_salted_matches_unsalted_on_hot_key(spark):
    """Pathological single-key skew: one key carries 2000 left rows (a
    hot user's event burst). salt_buckets must (a) leave the output
    byte-identical to the unsalted join and (b) split the hot key's
    left rows into salt_buckets bounded groups — the unit of join-task
    work — instead of one quadratic task."""
    hot = [("hot", datetime(2024, 1, 1, 0, 0, i % 60, i)) for i in range(2000)]
    cold = [("cold", datetime(2024, 1, 1, 0, 0, 5))]
    left = spark.createDataFrame(hot + cold, "k string, l_ts timestamp")
    right = spark.createDataFrame(
        [("hot", datetime(2024, 1, 1, 0, 0, s), float(s)) for s in range(0, 60, 7)]
        + [("cold", datetime(2024, 1, 1, 0, 0, 4), -1.0)],
        "k string, r_ts timestamp, val double",
    )
    kwargs = dict(on=["k"], left_ts="l_ts", right_ts="r_ts",
                  lower="2 SECONDS", upper="0 SECONDS")
    plain = interval_join(left, right, **kwargs)
    salted = interval_join(left, right, salt_buckets=8, **kwargs)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )

    # bounded skew: measure the OPERATOR's actual bucket assignment
    # (_salt_pair, not a re-derived formula that can drift) — every
    # (key, salt) group, the unit a join task range-scans, must be
    # ~1/8 of the hot key, not all of it
    from flink_etl_spark.operators.joins import _salt_pair

    salted_left, _ = _salt_pair(left.filter(F.col("k") == "hot"), right, 8)
    buckets = salted_left.groupBy("_salt").count().collect()
    assert len(buckets) == 8
    assert max(r["count"] for r in buckets) <= 2 * (2000 // 8)


def test_salt_pair_duplicate_spreading_modes(spark):
    """Byte-identical duplicate rows of a hot key: spread_duplicates
    (default) distributes them across buckets; the deterministic
    content-hash mode keeps them in ONE bucket but yields identical
    join results."""
    from flink_etl_spark.operators.joins import _salt_pair, salted_join

    dup = spark.createDataFrame([("hot", 1)] * 400, "k string, v int")
    dim = spark.createDataFrame([("hot", "H")], "k string, name string")

    spread, _ = _salt_pair(dup, dim, 8, spread_duplicates=True)
    assert spread.select("_salt").distinct().count() > 1

    pinned, _ = _salt_pair(dup, dim, 8, spread_duplicates=False)
    assert pinned.select("_salt").distinct().count() == 1

    a = salted_join(dup, dim, on=["k"], salt_buckets=8).collect()
    b = salted_join(
        dup, dim, on=["k"], salt_buckets=8, spread_duplicates=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 400


def test_asof_null_attribute_not_mixed_across_rows(spark):
    """Regression: when the true as-of match has a NULL attribute, the
    output must keep that NULL — not stitch in the value from an older
    right row (the per-column last(ignorenulls) bug)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:10"))], "k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:01"), 5.0, 100),
            (1, _ts("2024-01-01T00:00:02"), None, 200),  # the true match
        ],
        "k long, rts timestamp, val double, rid long",
    )
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts").first()
    assert out.rid == 200
    assert out.val is None  # NOT 5.0 from rid=100


def test_cogroup_asof_matches_native_asof(spark):
    """Three-way agreement: the cogrouped pandas merge_asof must equal
    the native union+window asof_join (itself DuckDB-ASOF-gated)."""
    from flink_etl_spark.operators.grouped import cogroup_asof
    from flink_etl_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("pts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("cts"), F.col("value").alias("click_value"),
    )
    native = asof_join(p, c, on=["user_id"], left_ts="pts", right_ts="cts",
                       tie_break="click_id")
    cg = cogroup_asof(p, c, on="user_id", left_ts="pts", right_ts="cts")
    n_rows = sorted(map(tuple, native.select(
        "purchase_id", "user_id", "click_id", "click_value").collect()))
    c_rows = sorted(map(tuple, cg.select(
        "purchase_id", "user_id", "click_id", "click_value").collect()))
    assert n_rows == c_rows
    assert len(n_rows) > 100


def test_cogroup_asof_hot_key_raises_clear_error(spark):
    """The cogrouped cross-check materializes a key's BOTH sides in one
    worker — a hot key past max_group_rows must fail with a named,
    actionable error (pointing at the window-based asof_join), never an
    opaque executor OOM."""
    import pytest

    from flink_etl_spark.operators.grouped import cogroup_asof

    left = spark.range(500).select(
        F.lit(7).alias("k"),
        F.col("id").alias("lid"),
        F.col("id").cast("timestamp").alias("lts"),
    )
    right = spark.range(500).select(
        F.lit(7).alias("k"),
        F.col("id").cast("timestamp").alias("rts"),
        F.col("id").cast("double").alias("val"),
    )
    out = cogroup_asof(
        left, right, on="k", left_ts="lts", right_ts="rts", max_group_rows=100
    )
    with pytest.raises(Exception) as e:
        out.collect()
    msg = str(e.value)
    assert "max_group_rows" in msg and "asof_join" in msg
    # generous cap: same plan succeeds
    ok = cogroup_asof(
        left, right, on="k", left_ts="lts", right_ts="rts", max_group_rows=10_000
    )
    assert ok.count() == 500


def test_asof_multi_key_groups(spark):
    """As-of with a composite key: matches never cross (sym, venue)."""
    left = spark.createDataFrame(
        [("A", "X", _ts("2024-01-01T10:00:05"), 1.0),
         ("A", "Y", _ts("2024-01-01T10:00:05"), 2.0)],
        "sym string, venue string, t_ts timestamp, px double",
    )
    right = spark.createDataFrame(
        [("A", "X", _ts("2024-01-01T10:00:01"), 99.0),
         ("A", "Y", _ts("2024-01-01T10:00:03"), 77.0)],
        "sym string, venue string, q_ts timestamp, bid double",
    )
    out = asof_join(left, right, on=["sym", "venue"],
                    left_ts="t_ts", right_ts="q_ts")
    rows = {(r.sym, r.venue): r.bid for r in out.collect()}
    assert rows == {("A", "X"): 99.0, ("A", "Y"): 77.0}


def test_interval_join_forward_window(spark, trades_quotes):
    """Forward-looking window: quotes within 5s AFTER each trade."""
    trades, quotes = trades_quotes
    out = interval_join(
        trades, quotes, on=["sym"], left_ts="t_ts", right_ts="q_ts",
        lower="0 SECONDS", upper="5 SECONDS",
    )
    got = {(r.sym, r.px, r.bid) for r in out.collect()}
    # A@3s forward (3,8]: quote at 8s; A@10s: none; B@5s: quote at 9s
    assert got == {
        ("A", 100.0, 100.5),
        ("A", 101.0, None),
        ("B", 50.0, 49.0),
        ("C", 7.0, None),
    }


def test_salted_join_rejects_right_and_full(spark):
    """right/full would surface each unmatched replicated row once per
    salt bucket — the operator must refuse instead of silently
    multiplying output."""
    import pytest as _pytest

    from flink_etl_spark.operators.joins import salted_join

    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer", "rightouter"):
        with _pytest.raises(ValueError, match="unsupported"):
            salted_join(a, b, on=["k"], how=how)
    # supported paths still work
    assert salted_join(a, b, on=["k"], how="left").count() == 10


def test_asof_join_null_keys_never_match(spark):
    """NULL join keys must not match each other (equi-join / DuckDB
    ASOF semantics): without the right-side null filter, the window
    partition would group both sides' null-key rows and fabricate a
    match."""
    from datetime import datetime

    from flink_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, None, datetime(2024, 1, 1, 12)),
         (2, 7, datetime(2024, 1, 1, 12))],
        "l_id long, user_id long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(10, None, datetime(2024, 1, 1, 11), 1.0),
         (11, 7, datetime(2024, 1, 1, 11), 2.0)],
        "r_id long, user_id long, rts timestamp, val double",
    )
    out = {r.l_id: r for r in asof_join(
        left, right, on=["user_id"], left_ts="lts", right_ts="rts"
    ).collect()}
    assert out[1].r_id is None and out[1].val is None  # null key: no match
    assert out[2].r_id == 11 and out[2].val == 2.0     # real key matches


def test_salt_spreads_identical_duplicate_rows(spark):
    """A hot key whose rows are byte-identical (retried/duplicated
    events) must still spread across salt buckets — a pure row-content
    hash would send every duplicate to ONE bucket, recreating the
    oversized task salting exists to fix."""
    from flink_etl_spark.operators.joins import _salt_pair

    dup = spark.createDataFrame([("hot", 1.0)] * 2000, "k string, v double")
    other = spark.createDataFrame([("hot", 9.0)], "k string, w double")
    s, _ = _salt_pair(dup, other, 8)
    n_buckets = s.select("_salt").distinct().count()
    assert n_buckets >= 4  # spread, not concentrated in one bucket


def test_cdc_merge_null_safe_keys_replay_idempotent(spark):
    """Replaying a delta containing a null-keyed row must UPDATE in
    place under null_safe_keys=True; the default SQL equality appends
    a duplicate (matching the oracle's join semantics)."""
    from flink_etl_spark.operators.merge import cdc_merge

    snap = spark.createDataFrame([(None, "a"), (1, "b")], "id long, v string")
    delta = spark.createDataFrame([(None, "a2")], "id long, v string")
    safe = cdc_merge(snap, delta, ["id"], null_safe_keys=True)
    assert safe.count() == 2  # null row updated, not duplicated
    assert {r.v for r in safe.collect()} == {"a2", "b"}
    unsafe = cdc_merge(snap, delta, ["id"])
    assert unsafe.count() == 3  # SQL semantics: null never matches
