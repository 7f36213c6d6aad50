"""Canonical-table loader for the driver's parquet testdata.

Maps the reference's Hive partitioned-table scans (S3/S4 in SURVEY.md §2.1,
README.md:228-248) onto `spark.read.parquet` — Catalyst handles partition
pruning / predicate pushdown / column pruning on these scans for free.

The testdata stores `events.ts` as parquet INT64 TIMESTAMP(NANOS)
(pandas default), which Spark rejects; with
`spark.sql.legacy.parquet.nanosAsLong` the column arrives as a raw
nanosecond LONG and we normalize it to TIMESTAMP_NTZ (microsecond
truncation — matches what DuckDB / any micro-precision engine sees).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

from flink_etl_spark.session import apply_runtime_confs

CANONICAL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns persisted as INT64 TIMESTAMP(NANOS) that surface as LongType
# under nanosAsLong and must be normalized to TIMESTAMP_NTZ
_NANOS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one canonical table, normalizing nano-timestamp columns."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            # integer div: ts is ~1.7e18, double division would lose ns bits
            df = df.withColumn(
                col,
                F.expr(f"CAST(timestamp_micros({col} div 1000) AS TIMESTAMP_NTZ)"),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=CANONICAL_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=CANONICAL_TABLES) -> None:
    """Register each canonical table as a temp view for `spark.sql` use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
