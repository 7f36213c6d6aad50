"""REAL end-to-end JDBC snapshot bootstrap (S2) against embedded Derby.

The reference's snapshot bootstrap was Sqoop-over-MySQL with zero code
(README.md:31, kafkaConfig.conf:13-16); no MySQL driver exists in this
container, but Spark ships Derby (its metastore backend), whose
embedded driver serves the same JDBC contract — so the wrapper's whole
surface (partitioned range read, bounds probe, empty-table null-bounds
guard, parquet bootstrap) executes against a live database here, and
only the MySQL-specific dialect remains untested."""

from __future__ import annotations

import os

import pytest

from flink_etl_spark.config import JdbcConfig
from flink_etl_spark.sources.jdbc import bootstrap_to_parquet, read_snapshot

#: live-MySQL endpoint for the dialect test, e.g.
#: "jdbc:mysql://host:3306/db?user=u&password=p". Unset in the sandbox
#: (no MySQL server or driver ships here) -> the test skips; the day
#: the environment grows a MySQL, the reference's exact dialect
#: (kafkaConfig.conf:13-16) is covered with zero code changes.
MYSQL_URL = os.environ.get("FLINK_ETL_SPARK_TEST_MYSQL_URL")


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """An embedded Derby database with a 1000-row `code_city`-shaped
    table (the reference's snapshot table) and an empty table."""
    db = str(tmp_path_factory.mktemp("derby") / "db")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE code_city (id BIGINT PRIMARY KEY, city VARCHAR(64), "
        "province VARCHAR(64), event_time BIGINT)"
    )
    ps = conn.prepareStatement("INSERT INTO code_city VALUES (?, ?, ?, ?)")
    for i in range(1000):
        ps.setLong(1, i)
        ps.setString(2, f"city_{i}")
        ps.setString(3, f"p{i % 7}")
        ps.setLong(4, 1704067200000 + i)
        ps.addBatch()
    ps.executeBatch()
    st.executeUpdate(
        "CREATE TABLE empty_tbl (id BIGINT PRIMARY KEY, v VARCHAR(8))"
    )
    conn.close()
    return url


def test_partitioned_snapshot_read_matches_table(spark, derby):
    """Range-partitioned parallel read: all rows exactly once (range
    predicates partition, never duplicate or drop), spread over the
    configured number of JDBC partitions with auto-probed bounds."""
    cfg = JdbcConfig(url=derby, table="code_city",
                     partition_column="id", num_partitions=4)
    df = read_snapshot(spark, cfg)
    assert df.rdd.getNumPartitions() == 4
    rows = df.orderBy("id").collect()
    assert len(rows) == 1000
    assert rows[0].ID == 0 and rows[0].CITY == "city_0"
    assert rows[999].PROVINCE == f"p{999 % 7}"
    # no duplicates across range slices
    assert df.select("id").distinct().count() == 1000


def test_explicit_bounds_skip_probe_but_keep_all_rows(spark, derby):
    """Caller-supplied bounds only steer the SPLIT; rows outside the
    bounds still arrive (Spark's first/last partitions are unbounded)."""
    cfg = JdbcConfig(url=derby, table="code_city",
                     partition_column="id", num_partitions=3)
    df = read_snapshot(spark, cfg, lower_bound=200, upper_bound=300)
    assert df.count() == 1000


def test_empty_table_null_bounds_guard(spark, derby):
    """The bounds probe on an empty table yields NULL min/max; the
    wrapper must fall back to an unpartitioned (trivially empty) read
    instead of handing Spark the string 'None' as a bound."""
    cfg = JdbcConfig(url=derby, table="empty_tbl",
                     partition_column="id", num_partitions=4)
    df = read_snapshot(spark, cfg)
    assert df.count() == 0


@pytest.mark.skipif(
    not MYSQL_URL,
    reason="no MySQL available; set FLINK_ETL_SPARK_TEST_MYSQL_URL to run",
)
def test_mysql_dialect_partitioned_read(spark, tmp_path):
    """The one S2 seam Derby cannot cover: the MySQL URL/dialect itself
    (quote style, alias case preservation, driver class resolution).
    Exercises the same partitioned read + bounds probe + parquet
    bootstrap as the Derby tests, against a live MySQL. Expects a table
    `code_city(id BIGINT PRIMARY KEY, city VARCHAR, province VARCHAR,
    event_time BIGINT)` with >= 1 row, as created by the reference's
    bootstrap flow (README.md:31)."""
    cfg = JdbcConfig(
        url=MYSQL_URL,
        table="code_city",
        partition_column="id",
        num_partitions=4,
        driver="com.mysql.cj.jdbc.Driver",
    )
    df = read_snapshot(spark, cfg)
    n = df.count()
    assert n >= 1
    assert df.select("id").distinct().count() == n  # ranges never dup
    out = str(tmp_path / "mysql_snapshot")
    bootstrap_to_parquet(spark, cfg, out)
    assert spark.read.parquet(out).count() == n


def test_bootstrap_to_parquet_roundtrip(spark, derby, tmp_path):
    """The whole §3.3 job: JDBC scan -> parquet snapshot, re-readable
    with identical contents — the one-time bootstrap the daily merge
    then builds on."""
    cfg = JdbcConfig(url=derby, table="code_city",
                     partition_column="id", num_partitions=4)
    out = str(tmp_path / "snapshot")
    bootstrap_to_parquet(spark, cfg, out)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert {r.ID for r in back.select("ID").collect()} == set(range(1000))


def test_partial_explicit_bound_is_honored(spark, derby):
    """Passing ONLY upper_bound must keep it (probe fills just the
    missing lower) — the old code overwrote both from the probe. With
    upper=100 over ids 0..999, the split ranges cover 0..100 and the
    unbounded last partition takes ~900 rows; if the caller's bound
    had been replaced by the live max (999), partitions would be
    near-even."""
    import pyspark.sql.functions as F

    cfg = JdbcConfig(url=derby, table="code_city",
                     partition_column="id", num_partitions=3)
    df = read_snapshot(spark, cfg, upper_bound=100)
    assert df.count() == 1000  # bounds steer the split, never filter
    per_part = (
        df.withColumn("_p", F.spark_partition_id())
        .groupBy("_p").count().agg(F.max("count")).first()[0]
    )
    assert per_part >= 800
