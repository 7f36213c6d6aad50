"""Metastore-table surface of the daily merge — the reference's actual
target is a TABLE (`INSERT OVERWRITE TABLE code_city ... FROM code_city`,
README.md:221-253), not a path; these tests drive the spark.table /
saveAsTable path end-to-end against the session catalog (managed parquet
tables in the local spark-warehouse), including the self-overwrite swap
and dynamic-partition INSERT OVERWRITE."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_etl_spark.operators.canal import with_dt
from flink_etl_spark.operators.merge import (
    _staging_table,
    insert_overwrite_partitions,
    merge_day,
    merge_day_table,
    overwrite_snapshot_table,
    recover_snapshot_table,
)


@pytest.fixture
def tables(spark):
    """Track tables created by a test and drop them afterwards."""
    created = []

    def _register(name):
        created.append(name)
        return name

    yield _register
    for t in created:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {_staging_table(t)}")


def _snapshot_df(spark, n=8):
    return spark.createDataFrame(
        [(k, f"old{k}", "p0") for k in range(n)],
        "id long, city string, province string",
    )


def _delta_df(spark, lo=4, hi=12):
    return with_dt(
        spark.createDataFrame(
            [(k, 1704067200000 + k, k, f"new{k}", "p1") for k in range(lo, hi)],
            "id long, es long, ts long, city string, province string",
        ),
        es_col="es",
    ).select("id", "es", "ts", "city", "province", "dt")


def test_merge_day_table_matches_path_merge(spark, tables):
    """spark.table in, saveAsTable-swap out — same rows as the path
    merge over identical inputs."""
    snap, delta, out = map(tables, ("tm_snap", "tm_delta", "tm_out"))
    _snapshot_df(spark).write.saveAsTable(snap)
    _delta_df(spark).write.partitionBy("dt").saveAsTable(delta)

    merge_day_table(spark, snap, delta, day="20240101", keys=["id"],
                    out_table=out)
    got = {(r.id, r.city) for r in spark.table(out).collect()}
    want = {
        (r.id, r.city)
        for r in merge_day(
            _snapshot_df(spark), _delta_df(spark), day="20240101", keys=["id"]
        ).collect()
    }
    assert got == want and len(got) == 12


def test_merge_day_table_self_overwrite(spark, tables):
    """out_table defaults to the snapshot table itself — the reference's
    `INSERT OVERWRITE code_city ... FROM code_city`; the plan reads the
    table it replaces, which only works through the staged swap."""
    snap, delta = map(tables, ("tm_self_snap", "tm_self_delta"))
    _snapshot_df(spark).write.saveAsTable(snap)
    _delta_df(spark).write.partitionBy("dt").saveAsTable(delta)

    merge_day_table(spark, snap, delta, day="20240101", keys=["id"])
    rows = {r.id: r.city for r in spark.table(snap).collect()}
    assert len(rows) == 12
    assert rows[2] == "old2" and rows[5] == "new5" and rows[11] == "new11"
    # the staging table must not survive a successful swap
    assert not spark.catalog.tableExists(_staging_table(snap))


def test_recover_snapshot_table_promotes_and_cleans(spark, tables):
    """Crash in the drop..rename window: target table gone, staging
    intact -> promote. Target intact + stale staging -> drop the stale
    copy, never promote it."""
    t = tables("tm_recover")
    _snapshot_df(spark, 3).write.saveAsTable(_staging_table(t))
    assert recover_snapshot_table(spark, t) is True
    assert spark.table(t).count() == 3
    assert recover_snapshot_table(spark, t) is False  # idempotent

    spark.createDataFrame([(99, "stale", "x")],
                          "id long, city string, province string"
                          ).write.saveAsTable(_staging_table(t))
    assert recover_snapshot_table(spark, t) is False
    assert not spark.catalog.tableExists(_staging_table(t))
    assert spark.table(t).count() == 3  # target untouched


def test_cli_merge_day_tables_mode(spark, tables):
    """`python -m flink_etl_spark merge-day --tables` runs the metastore
    path end-to-end: spark.table in, staged table swap out."""
    from flink_etl_spark.__main__ import main

    snap, delta = map(tables, ("tm_cli_snap", "tm_cli_delta"))
    _snapshot_df(spark).write.saveAsTable(snap)
    _delta_df(spark).write.partitionBy("dt").saveAsTable(delta)
    rc = main([
        "merge-day", "--snapshot", snap, "--delta", delta,
        "--day", "20240101", "--keys", "id", "--tables",
    ])
    assert rc == 0
    rows = {r.id: r.city for r in spark.table(snap).collect()}
    assert len(rows) == 12 and rows[5] == "new5"


def test_insert_overwrite_partitions_is_dynamic(spark, tables):
    """Dynamic INSERT OVERWRITE replaces exactly the partitions present
    in the frame; other partitions survive, and the caller's
    partitionOverwriteMode conf is restored."""
    t = tables("tm_dyn")
    # one row per day across 6 distinct dt partitions
    multi_day = with_dt(
        spark.createDataFrame(
            [(k, 1704067200000 + k * 86_400_000, k, f"c{k}", "p") for k in range(6)],
            "id long, es long, ts long, city string, province string",
        ),
        es_col="es",
    ).select("id", "es", "ts", "city", "province", "dt")
    multi_day.write.partitionBy("dt").saveAsTable(t)
    assert spark.table(t).select("dt").distinct().count() == 6
    day = spark.table(t).select("dt").orderBy("dt").first().dt

    replacement = (
        spark.table(t)
        .filter(F.col("dt") == day)
        .limit(1)
        .withColumn("city", F.lit("rewritten"))
    )
    # insertInto is position-based with partition columns last — keep
    # the table's column order
    replacement = replacement.select(*spark.table(t).columns)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        insert_overwrite_partitions(replacement, t)
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            == "static"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    out = spark.table(t)
    assert out.filter(F.col("dt") == day).count() == 1
    assert out.filter(F.col("dt") == day).first().city == "rewritten"
    # every other partition untouched
    assert out.filter(F.col("dt") != day).count() == 5


def test_merge_day_table_bucketed_snapshot_never_shuffles(spark, tables):
    """The 100 TB shape of the daily job: snapshot stored bucketBy(keys),
    so the full-outer merge reads the bucketed layout and the ONLY
    exchange in the plan is the delta's (whose hash partitioning the
    latest-per-key window already required). The merged output is
    written back bucketed through the staged swap, so the spec — and
    the shuffle-free property — survives into the next day's merge."""
    import re

    snap, delta = map(tables, ("tm_bk_snap", "tm_bk_delta"))
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    (
        _snapshot_df(spark, n=64)
        .write.bucketBy(nb, "id").sortBy("id").saveAsTable(snap)
    )
    _delta_df(spark).write.partitionBy("dt").saveAsTable(delta)

    # plan shape BEFORE execution: bucketed scan on the snapshot side,
    # exactly one Exchange (the delta), keyed on the merge key
    merged = merge_day(
        spark.table(snap), spark.table(delta), day="20240101", keys=["id"]
    )
    plan = merged._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Bucketed: true" in plan
    exchanges = re.findall(r"hashpartitioning\([^)]*\)", plan)
    assert len(exchanges) == 1 and "id" in exchanges[0]

    # end-to-end through the swap, twice (day 2 re-reads the table the
    # first merge wrote): results match the unbucketed path merge and
    # the bucket spec survives the DROP + RENAME swap
    merge_day_table(spark, snap, delta, day="20240101", keys=["id"],
                    n_buckets=nb)
    want = {
        (r.id, r.city)
        for r in merge_day(
            _snapshot_df(spark, n=64), _delta_df(spark),
            day="20240101", keys=["id"],
        ).collect()
    }
    assert {(r.id, r.city) for r in spark.table(snap).collect()} == want

    plan2 = merge_day(
        spark.table(snap), spark.table(delta), day="20240101", keys=["id"]
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Bucketed: true" in plan2, "bucket spec lost in the staged swap"


def test_overwrite_snapshot_table_bucketed_requires_keys(spark):
    import pytest as _pytest

    df = spark.range(3).select(F.col("id"))
    with _pytest.raises(ValueError, match="bucket_keys"):
        overwrite_snapshot_table(df, "tm_bad", n_buckets=4)
