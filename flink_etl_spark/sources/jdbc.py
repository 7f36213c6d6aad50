"""JDBC snapshot bootstrap (S2, SURVEY.md §2.1 / §3.3).

The reference delegates the one-time MySQL -> warehouse full export to
Sqoop (README.md:31, config kafkaConfig.conf:13-16). Spark shape: a
range-partitioned parallel JDBC read written straight to Parquet — the
executors each pull one key-range slice; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.config import JdbcConfig


def read_snapshot(spark: SparkSession, cfg: JdbcConfig,
                  lower_bound: int | None = None,
                  upper_bound: int | None = None) -> DataFrame:
    """Partitioned full-table read. With a numeric `partition_column`,
    Spark issues `num_partitions` range predicates in parallel (the
    Sqoop split-column pattern); bounds default to min/max probed by a
    bounds query when omitted."""
    reader = (
        spark.read.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("user", cfg.user)
        .option("password", cfg.password)
    )
    if cfg.driver:
        reader = reader.option("driver", cfg.driver)
    if cfg.partition_column:
        if lower_bound is None or upper_bound is None:
            probe = (
                spark.read.format("jdbc")
                .option("url", cfg.url)
                .option(
                    "query",
                    f"SELECT min({cfg.partition_column}) AS lo, "
                    f"max({cfg.partition_column}) AS hi FROM {cfg.table}",
                )
                .option("user", cfg.user)
                .option("password", cfg.password)
            )
            if cfg.driver:
                probe = probe.option("driver", cfg.driver)
            bounds = probe.load().first()
            # positional, not bounds["lo"]: identifier case folding is
            # dialect-specific (Derby/Oracle uppercase unquoted aliases,
            # MySQL preserves them) — found by the first live-database
            # run of this path (tests/test_jdbc.py, embedded Derby).
            # Fill ONLY the missing bound(s): a caller pinning one side
            # (e.g. upper_bound at a snapshot cutoff) must not have it
            # silently replaced by the live table's max
            if lower_bound is None:
                lower_bound = bounds[0]
            if upper_bound is None:
                upper_bound = bounds[1]
            if lower_bound is None or upper_bound is None:
                # empty source table: bounds are NULL and Spark's JDBC
                # options would receive the string "None" — fall back to
                # an unpartitioned (trivially empty) read
                return reader.load()
        reader = (
            reader.option("partitionColumn", cfg.partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(cfg.num_partitions))
        )
    return reader.load()


def bootstrap_to_parquet(spark: SparkSession, cfg: JdbcConfig, out_path: str) -> None:
    """The whole §3.3 job: parallel JDBC scan -> Parquet snapshot."""
    read_snapshot(spark, cfg).write.mode("overwrite").parquet(out_path)
