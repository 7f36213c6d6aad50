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


def rescue_scan_parallelism(
    df: DataFrame,
    target: int | None = None,
    max_bytes: int = 256 << 20,
) -> DataFrame:
    """Round-robin repartition a SMALL, under-split scan up to core
    count. A single-row-group / single-file parquet input plans as ONE
    scan task no matter how many cores exist — every expression
    upstream of the first exchange (tokenize, hash, shingle, vector
    math) then runs serially. One tiny round-robin exchange of the raw
    rows buys full-width parallelism for the scan-side compute.

    Deliberately INERT at scale — no-op unless BOTH hold:

    * the scan plans fewer than half the target tasks (real corpora
      split into thousands of tasks by size; only small/single-split
      inputs qualify), and
    * the input is under ``max_bytes`` (the exchange must be cheap; a
      big under-split input is a storage-layout problem this helper
      must not paper over with a corpus-wide shuffle).

    When to use: explicitly, on scan-COMPUTE-heavy operator inputs
    (minhash/simhash profiles, span/substring digesting, repetition
    stats, per-vector math). Measured at sf0.1/local[32]: -21% to -62%
    end-to-end on those; measurably NEGATIVE on broadcast-join-bound
    queries that branch one scan into a small fitted side (unigram-LM
    +78% wall, decontaminate +86%) where the extra exchange outweighs
    serial scanning — so this is NOT applied inside `load_table` or
    any operator, and gated catalog plans stay exchange-minimal."""
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    try:
        n_parts = df.rdd.getNumPartitions()
        # Hadoop FileSystem sizing, not os.path.getsize: inputFiles()
        # returns URIs of whatever scheme backs the table (hdfs://,
        # s3a://, file:) and the helper must size them all — a
        # local-only stat would silently disable the rescue off-laptop.
        from flink_etl_spark.operators.merge import _hadoop_fs

        size = 0
        for uri in df.inputFiles():
            fs, hpath = _hadoop_fs(spark, uri)
            size += fs.getFileStatus(hpath).getLen()
    except Exception:
        return df
    if n_parts >= max(2, target // 2) or size > max_bytes:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str, names=CANONICAL_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=CANONICAL_TABLES) -> None:
    """Register each canonical table as a temp view for `spark.sql` use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
