"""Long-document rebuild stress: the r6 verdict flagged the naive
per-token `exists()` rebuild in substring/span dedup as O(T*D) per row
— quadratic on a long, mostly-duplicated document (D ~ T). r7 replaced
it with merged-interval gap slicing (O(D log D + T)). This probe
isolates the REBUILD stage on synthetic long documents with ~80%
duplication, times the shipped interval rebuild against an inline copy
of the old naive expression, and asserts identical output. Ad-hoc
evidence for docs/SCALING.md; not part of the test suite.

Usage: python tools/rebuild_probe.py [n_docs=16] [tokens_per_doc=10000]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402


def naive_rebuild(joined, k: int, stride: int):
    """The pre-r7 rebuild: filter every token against the full drop
    list — O(T*D)/row (kept verbatim here as the probe baseline)."""
    dup_arr = F.coalesce(F.col("_dup"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(
            dup_arr,
            lambda p: (p * F.lit(stride) <= i)
            & (i <= p * F.lit(stride) + F.lit(k - 1)),
        ),
    )
    return joined.select(
        F.col("doc_id"),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
        F.concat_ws(" ", kept).alias("dedup_text"),
    )


def main(n_docs: int = 16, tokens: int = 10_000) -> None:
    from flink_etl_spark.operators.prep import (
        _gap_slice_rebuild,
        _substring_anchors,
        _substring_narrow,
    )
    from flink_etl_spark.session import get_spark

    k = 50
    spark = get_spark(app_name="rebuild-probe")
    spark.sparkContext.setLogLevel("ERROR")

    shared_n = int(tokens * 0.8)
    shared = [f"s{j}" for j in range(shared_n)]
    rows = []
    for i in range(n_docs):
        uniq = [f"u{i}_{j}" for j in range(tokens - shared_n)]
        # i-token unique prefix shifts the shared block off any grid —
        # the offset-robust case; stride-1 anchors still match
        rows.append((i, " ".join(uniq[:i] + shared + uniq[i:])))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    work = tempfile.mkdtemp(prefix="rebuild_probe_")
    wa = _substring_anchors(docs, k, 1, "doc_id", "text", "hash64")
    wa.write.mode("overwrite").parquet(f"{work}/anchors")
    wa = spark.read.parquet(f"{work}/anchors")
    narrow = _substring_narrow(wa, "doc_id", 1)
    occ = F.struct(F.col("doc_id"), F.col("_pos"))
    winners = narrow.groupBy("_k").agg(F.min(occ).alias("_w"))
    (
        narrow.join(winners, "_k")
        .filter(occ != F.col("_w"))
        .groupBy("doc_id")
        .agg(F.collect_list("_pos").alias("_dup"))
        .write.mode("overwrite")
        .parquet(f"{work}/dropped")
    )
    dropped = spark.read.parquet(f"{work}/dropped")
    joined = wa.join(dropped, on="doc_id", how="left")
    d_stats = dropped.select(
        F.min(F.size("_dup")), F.avg(F.size("_dup")), F.max(F.size("_dup"))
    ).first()
    print(
        f"{n_docs} docs x {tokens} tokens, ~{shared_n/tokens:.0%} duplicated; "
        f"drop-list sizes min/avg/max = {d_stats[0]}/{d_stats[1]:.0f}/{d_stats[2]}"
    )

    def run(label, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {label}: {time.perf_counter() - t0:.1f}s", flush=True)

    interval = _gap_slice_rebuild(
        joined, "_toks", "_dup", k, 1, "_kept"
    ).select(
        F.col("doc_id"),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size("_kept").cast("long").alias("n_tokens_kept"),
        F.concat_ws(" ", "_kept").alias("dedup_text"),
    )
    run("interval rebuild (shipped)", interval)
    run("naive O(T*D) rebuild (pre-r7)", naive_rebuild(joined, k, 1))

    a = sorted(map(tuple, interval.collect()))
    b = sorted(map(tuple, naive_rebuild(joined, k, 1).collect()))
    assert a == b, "rebuilds disagree"
    print("  outputs identical")


if __name__ == "__main__":
    main(*(int(x) for x in sys.argv[1:]))
