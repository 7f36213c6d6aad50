"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over `flink_etl_spark.queries.CATALOG` — each catalog entry
pairs a Spark DataFrame implementation with its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_etl_spark import queries as _q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's daily CDC job end-to-end
    (partition-prune -> latest-per-key compaction -> full-outer merge)."""
    return _q.cdc_merge_day(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
