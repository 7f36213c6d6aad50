"""SparkSession factory with engine defaults.

Replaces the reference's environment setup (HdfsSink.java:36-44 —
execution env, parallelism, checkpointing) with a Spark-first
configuration: AQE on, timezone pinned UTC (the reference used the JVM
default TZ in EventTimeBucketAssigner.java:41-42, which is
nondeterministic across machines — we pin and document the deviation),
dynamic partition overwrite for INSERT OVERWRITE semantics
(README.md:222).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

# Runtime-settable SQL confs the engine relies on. Applied both at
# session build time and defensively by `apply_runtime_confs` when we
# receive a session we didn't build (e.g. the verification driver's).
RUNTIME_CONFS: dict[str, str] = {
    # driver testdata uses pandas-default INT64 TIMESTAMP(NANOS) which
    # Spark refuses by default; read them as raw longs and convert.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic event-time -> yyyyMMdd bucketing (see module doc)
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: partition coalescing, skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # INSERT OVERWRITE a single dt= partition without nuking the table
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # dt partitions are STRINGS ("dt=00000000" sentinel included); type
    # inference would read them back as ints and turn the sentinel into 0
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    # InferFiltersFromGenerate turns every explode(expensive_expr) into
    # an extra `size(expensive_expr) > 0 AND isnotnull(...)` filter that
    # RE-EVALUATES the expression per row (no CSE across Filter/Generate).
    # This engine's explodes are over computed arrays — from_json'd Canal
    # envelopes, regex token splits, shingle transforms, band structs —
    # where the inferred filter costs far more than the empty rows it
    # prunes: measured 1.45s -> 0.91s (-37%) on 1M-row Canal ingest,
    # 3.05s -> 2.20s on the canal_ingest_flatten headline query, with
    # zero result changes (the rule is redundant with explode's own
    # null/empty-drop semantics).
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
}


def get_spark(
    app_name: str = "flink-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for tests; on a real cluster callers pass their own master/deploy
    config and only the SQL confs below matter.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # the runtime re-apply exists for session REUSE (getOrCreate handed
    # back an existing session whose confs drifted) — it must not undo
    # the caller's explicit extra_conf, so overridden keys are excluded
    # and extra_conf is re-asserted last
    apply_runtime_confs(spark, exclude=set(extra_conf or ()))
    if extra_conf:
        for k, v in extra_conf.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # static conf on a reused session: builder had it
    return spark


def apply_runtime_confs(
    spark: SparkSession, exclude: set[str] | None = None
) -> SparkSession:
    """Best-effort apply engine confs to an externally-built session.

    Every conf in RUNTIME_CONFS is runtime-settable in Spark 4.x; the
    try/except guards against future immutability or locked-down
    sessions — the engine then degrades gracefully instead of failing.
    `exclude` skips keys the caller explicitly overrode (get_spark's
    extra_conf must win over the engine defaults).
    """
    for k, v in RUNTIME_CONFS.items():
        if exclude and k in exclude:
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


# Conf key gating lineage anchors between fast executor-local
# checkpoints and fault-tolerant reliable checkpoints (see `anchor`).
RELIABLE_CHECKPOINT_CONF = "spark.flinkEtlSpark.reliableCheckpoint"


def anchor(df, eager: bool = True):
    """Materialize a DataFrame to cap lineage / stop re-evaluation.

    Defaults to ``localCheckpoint`` — blocks live on executors, freed
    by the ContextCleaner once the returned frame is dropped; the
    right trade on local mode and on clusters without executor churn.
    The cost it hides: localCheckpoint blocks DIE with a lost
    executor, failing the job instead of recomputing, so long-running
    cluster deployments of the iterative/self-join operators
    (`media_phash_dup_clusters`, `duplicate_clusters`, `bpe_fit`)
    should set the session conf
    ``spark.flinkEtlSpark.reliableCheckpoint=true`` AND a checkpoint
    directory (``spark.sparkContext.setCheckpointDir(hdfs_path)``) —
    this helper then uses reliable ``checkpoint()``, which survives
    executor loss at the price of one HDFS round-trip per anchor.
    If the conf is set without a checkpoint dir, raises loudly
    (Spark's own error names the fix) rather than silently degrading
    the fault-tolerance the caller asked for."""
    spark = df.sparkSession
    try:
        reliable = (
            str(spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false")).lower()
            == "true"
        )
    except Exception:
        reliable = False
    if reliable:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


@contextmanager
def dynamic_partition_overwrite(spark: SparkSession):
    """Pin `partitionOverwriteMode=dynamic` for the enclosed write and
    restore the caller's conf after.

    The guarantee must not rest on an ambient session conf: under
    Spark's `static` default, a partitioned `mode("overwrite")` write
    silently DELETES every partition absent from the frame — a one-day
    backfill wipes the table. Every partition-overwrite site in the
    package (ingest sink, compaction, rollup upsert, INSERT OVERWRITE)
    goes through this one manager so the hazard is handled in exactly
    one place."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, prev)
