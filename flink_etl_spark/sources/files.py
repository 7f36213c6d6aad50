"""File sources (S3/S4, SURVEY.md §2.1): partitioned parquet/text scans.

Catalyst gives partition pruning, predicate pushdown and column pruning
on these for free; the helpers here only encode the layout conventions
(Hive-style `dt=` directories, JSONL Canal dumps).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a dt-partitioned table root; `dt` arrives as a partition
    column and `.filter(col('dt') == day)` prunes directories."""
    return spark.read.format(fmt).option("basePath", path).load(path)


def read_day(spark: SparkSession, path: str, day: str, fmt: str = "parquet") -> DataFrame:
    """One day's partition (README.md:245-248's `WHERE dt='20200324'`)."""
    return read_partitioned(spark, path, fmt).filter(F.col("dt") == F.lit(day))


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Canal dump as raw lines: one `value` string column, exactly what
    the Kafka source would deliver (batch test-double)."""
    return spark.read.text(path)
