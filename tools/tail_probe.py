"""Tail probe: stretch the scale ladder PAST the 10x replica for the
two queries with the largest 10x scaling exponents (r4:
`semdedup_keepers` 0.38, `decontaminate_ngrams` 0.37) and measure
whether the exponents keep flattening on each further step — the
spot-check that has to hold before anyone believes the 100x claim.
r5 ran the 10x -> 30x step (exponents 0.22 / 0.24); r6 extends the
ladder to 100x (the replica text-substitution alphabet now has 312
distinct permutations, so a 100x replica still carries no cross-copy
duplicate cliques).

All points are built and timed IN THE SAME SESSION (docs + embeddings
only — the other tables are irrelevant to these two operators), so each
exponent is an apples-to-apples ratio between consecutive points:

    exp(a -> b) = log(t_b / t_a) / log(b / a)

Methodology matches tools/scale_probe.py: join-consistent replicas
(`tools/replicate_testdata.py` — copy-distinct text substitutions),
best-of-2 cold-cache noop-sink runs, auto knobs throughout (no hand
tuning at any scale).

r11 adds `--query join_multiway`: the one scale transition the r10
verdict adjudicated by ARGUMENT rather than measurement —
`join_multiway_region_revenue`'s 543x shuffle-byte jump at the 10x
rung is a one-time broadcast->shuffle strategy transition (the reduced
orders side crosses the broadcast threshold), claimed linear past it.
This arm measures the 10x -> 30x step on join-consistent replicas of
the JOIN tables (customer/orders/lineitem; dims single-copy) and
reports actual shuffle bytes (statusStore deltas, the
tools/shuffle_probe.py method) plus wall: the claim holds iff the
post-transition byte ratio is ~3x for the 3x step and the wall
exponent is <= 1.

Usage: python tools/tail_probe.py [--query join_multiway|media_phash]
       [point ...]
       (default query: the dedup pair at points 10 30 100;
        join_multiway defaults to points 10 30)
Results are recorded in docs/SCALING.md (tail probe section).
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_join_multiway(points_list: list[int] | None = None) -> None:
    from flink_etl_spark import queries as Q
    from flink_etl_spark.session import get_spark
    from tools.replicate_testdata import build_replica
    from tools.shuffle_probe import _fmt_bytes, _shuffle_totals

    if not points_list:
        points_list = [10, 30]
    points_list = sorted(points_list)

    spark = get_spark(
        app_name="tail-probe-join",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"
    fn = Q.queries()["join_multiway_region_revenue"]

    points: dict[int, str] = {}
    for n in points_list:
        out = tempfile.mkdtemp(prefix=f"sf01x{n}_join_")
        t0 = time.perf_counter()
        build_replica(
            spark, src, out,
            n, tables=("region", "nation", "customer", "orders", "lineitem"),
        )
        print(f"built {n}x join-table replica in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        points[n] = out

    bts, walls = {}, {}
    for n, d in points.items():
        spark.catalog.clearCache()
        b0, _ = _shuffle_totals(sc)
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        b1, _ = _shuffle_totals(sc)
        bts[n] = b1 - b0  # single run: shuffle volume is deterministic
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        walls[n] = min(w, time.perf_counter() - t0)  # wall best-of-2
        print(f"  join_multiway @ {n}x: {walls[n]:.2f}s, "
              f"shuffle {_fmt_bytes(bts[n])}", flush=True)
    for a, b in zip(points_list, points_list[1:]):
        step = b / a
        byte_ratio = bts[b] / bts[a] if bts[a] else float("inf")
        exp = math.log(walls[b] / walls[a]) / math.log(step)
        print(
            f"  join_multiway {a}x->{b}x ({step:.0f}x step): "
            f"byte ratio {byte_ratio:.2f} "
            f"(linear would be {step:.0f}), wall exp {exp:.2f}",
            flush=True,
        )
    spark.stop()


def run_media_phash(points_list: list[int] | None = None) -> None:
    """Measure media_phash_pairs' UNCAPPED candidate growth across the
    replica ladder. Expected readings (recorded in docs/SCALING.md):
    the 10x point is still part-broadcast, the 10x->30x step reads
    ~8x bytes for 3x (transition completing), and 30x->90x reads
    ~65x — the hot-bucket blowup from correlated perceptual-hash
    bits that `max_bucket` exists to cap (1.0 GiB -> 1.6 MiB at 90x
    with max_bucket=256). A large ratio from this probe is the
    DOCUMENTED uncapped behavior, not a regression; re-run with the
    capped arm before concluding anything changed."""
    from flink_etl_spark.operators.multimodal import (
        make_media_table,
        media_phash_near_dups,
    )
    from flink_etl_spark.session import get_spark
    from flink_etl_spark.sources.tables import load_table
    from tools.replicate_testdata import build_replica
    from tools.shuffle_probe import _fmt_bytes, _shuffle_totals

    if not points_list:
        points_list = [10, 30]
    points_list = sorted(points_list)

    spark = get_spark(
        app_name="tail-probe-phash",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"

    points: dict[int, str] = {}
    for n in points_list:
        out = tempfile.mkdtemp(prefix=f"sf01x{n}_phash_")
        t0 = time.perf_counter()
        build_replica(spark, src, out, n, tables=("documents",))
        print(f"built {n}x documents replica in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        points[n] = out

    def run(d):
        docs = load_table(spark, d, "documents")
        media = make_media_table(docs).select("media_id", "payload")
        media_phash_near_dups(media, max_hamming=8).write.format(
            "noop"
        ).mode("overwrite").save()

    bts, walls = {}, {}
    for n, d in points.items():
        spark.catalog.clearCache()
        b0, _ = _shuffle_totals(sc)
        t0 = time.perf_counter()
        run(d)
        w = time.perf_counter() - t0
        b1, _ = _shuffle_totals(sc)
        bts[n] = b1 - b0
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        run(d)
        walls[n] = min(w, time.perf_counter() - t0)
        print(f"  media_phash_pairs @ {n}x: {walls[n]:.2f}s, "
              f"shuffle {_fmt_bytes(bts[n])}", flush=True)
    for a, b in zip(points_list, points_list[1:]):
        step = b / a
        byte_ratio = bts[b] / bts[a] if bts[a] else float("inf")
        exp = math.log(walls[b] / walls[a]) / math.log(step)
        print(
            f"  media_phash_pairs {a}x->{b}x ({step:.0f}x step): "
            f"byte ratio {byte_ratio:.2f} "
            f"(linear would be {step:.0f}), wall exp {exp:.2f}",
            flush=True,
        )
    spark.stop()


def main(points_list: list[int] | None = None) -> None:
    from flink_etl_spark.operators.dedup import semdedup
    from flink_etl_spark.operators.prep import decontaminate
    from flink_etl_spark.session import get_spark
    from flink_etl_spark.sources.tables import load_table
    from tools.replicate_testdata import build_replica

    if not points_list:
        points_list = [10, 30, 100]
    points_list = sorted(points_list)

    spark = get_spark(app_name="tail-probe")
    spark.sparkContext.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"

    points: dict[int, str] = {}
    for n in points_list:
        out = tempfile.mkdtemp(prefix=f"sf01x{n}_tail_")
        t0 = time.perf_counter()
        build_replica(spark, src, out, n, tables=("documents", "embeddings"))
        print(f"built {n}x docs+embeddings replica in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        points[n] = out

    def bench(name, fn):
        times = {}
        for n, d in points.items():
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[n] = best
            print(f"  {name} @ {n}x: {best:.2f}s", flush=True)
        for a, b in zip(points_list, points_list[1:]):
            exp = math.log(times[b] / times[a]) / math.log(b / a)
            print(f"  {name} exp({a}x->{b}x) = {exp:.2f}", flush=True)

    def _semdedup(d):
        embs = load_table(spark, d, "embeddings")
        # the bench's production arm: two-level quantizer, auto cells
        return semdedup(embs, threshold=0.35, n_cells="auto",
                        quantizer="two_level")

    def _decontam(d):
        docs = load_table(spark, d, "documents")
        return decontaminate(docs.filter("doc_id % 97 != 0"),
                             docs.filter("doc_id % 97 = 0"), n=3)

    bench("semdedup_keepers", _semdedup)
    bench("decontaminate_ngrams", _decontam)
    spark.stop()


def run_media_phash_recall(points_list: list[int] | None = None) -> None:
    """r13: measure what the `max_bucket` cap actually COSTS (and what
    the DCT hash buys) instead of arguing it. Per ladder point, plant
    one-byte-substituted near-dups (the gate's derivation, negative
    ids) into the replica corpus, then for each signature
    (ahash / dcthash) x cap (None / 256):

      recall   = planted pairs found / planted pairs whose TRUE
                 Hamming distance is within the budget (truth from a
                 direct planted-vs-original hash join, not the band
                 machinery under test)
      + wall, shuffle bytes, and per-signature chunk-bucket occupancy
        (max bucket, #buckets over the cap) — the decorrelation
        evidence for the DCT arm.

    Results recorded in docs/SCALING.md (phash ladder section)."""
    import pyspark.sql.functions as F

    from flink_etl_spark.catalog.multimodal import _PHASH_DERIVE
    from flink_etl_spark.operators.dedup import hamming_banded_pairs
    from flink_etl_spark.operators.multimodal import (
        make_media_table,
        media_perceptual_hashes,
    )
    from flink_etl_spark.session import get_spark
    from flink_etl_spark.sources.tables import load_table
    from tools.replicate_testdata import build_replica
    from tools.shuffle_probe import _fmt_bytes, _shuffle_totals

    if not points_list:
        points_list = [10, 30, 90]
    points_list = sorted(points_list)
    spark = get_spark(
        app_name="tail-probe-phash-recall",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"

    for n in points_list:
        out = tempfile.mkdtemp(prefix=f"sf01x{n}_phrec_")
        build_replica(spark, src, out, n, tables=("documents",))
        docs = load_table(spark, out, "documents")
        media = make_media_table(docs).select("media_id", "payload")
        planted = docs.filter("doc_id % 17 = 3").select(
            (-F.col("doc_id") - 1).alias("media_id"),
            F.encode(F.expr(_PHASH_DERIVE), "utf-8").alias("payload"),
        )
        universe = media.unionByName(planted)
        sigs = media_perceptual_hashes(universe).localCheckpoint(eager=True)
        n_media = sigs.count()
        print(f"\n=== {n}x: {n_media} media ({n_media - docs.count()} "
              "planted) ===", flush=True)
        for hash_col, bits in (("ahash", 64), ("dcthash", 63)):
            truth = (
                sigs.alias("p")
                .filter("media_id < 0")
                .join(
                    sigs.alias("o"),
                    F.expr("o.media_id = -p.media_id - 1"),
                )
                .select(
                    F.expr(
                        f"bit_count(p.{hash_col} ^ o.{hash_col})"
                    ).alias("h")
                )
            )
            n_true = truth.filter("h <= 8").count()
            # chunk-bucket occupancy (k=8 banding): the decorrelation
            # evidence — how hot do the band buckets actually run
            cb = bits // 9
            occ = (
                sigs.select(
                    F.explode(
                        F.array(*[
                            F.struct(
                                F.lit(j).alias("cid"),
                                F.shiftright(F.col(hash_col), j * cb)
                                .bitwiseAND(F.lit(
                                    (1 << ((bits - j * cb) if j == 8 else cb))
                                    - 1
                                )).alias("cv"),
                            )
                            for j in range(9)
                        ])
                    ).alias("c")
                )
                .groupBy("c").count()
            )
            stats = occ.agg(
                F.max("count").alias("mx"),
                F.sum(F.when(F.col("count") > 256, 1).otherwise(0))
                .alias("over"),
                F.count("*").alias("nb"),
            ).collect()[0]
            print(
                f"  {hash_col}: true planted pairs<=8: {n_true}; "
                f"buckets={stats['nb']} max_occ={stats['mx']} "
                f"over256={stats['over']}",
                flush=True,
            )
            for cap in (None, 256):
                spark.catalog.clearCache()
                b0, _ = _shuffle_totals(sc)
                t0 = time.perf_counter()
                pairs = hamming_banded_pairs(
                    sigs, bits, 8, id_col="media_id", sig_col=hash_col,
                    max_bucket=cap,
                ).localCheckpoint(eager=True)
                wall = time.perf_counter() - t0
                b1, _ = _shuffle_totals(sc)
                found = pairs.count()
                hit = pairs.filter("doc_a = -doc_b - 1").count()
                rec = hit / n_true if n_true else float("nan")
                print(
                    f"    cap={str(cap):>4}: wall={wall:6.1f}s "
                    f"shuffle={_fmt_bytes(b1 - b0):>10} pairs={found:>8} "
                    f"planted_found={hit} recall={rec:.4f}",
                    flush=True,
                )
    spark.stop()


def run_media_phash_clusters(points_list: list[int] | None = None) -> None:
    """r13: the collapse-first cluster operator vs the raw pair join
    at ladder scale — the claim under test is that clustering cost is
    bound by DISTINCT signatures, not corpus size (the pair join's
    90x rung: 1.1 GiB shuffle / 26.9 s for ahash, 456 MiB / 12.2 s
    for dcthash). Reports distinct-signature count, wall, shuffle
    bytes for media_phash_dup_clusters(hash_col='dcthash')."""
    import pyspark.sql.functions as F

    from flink_etl_spark.operators.multimodal import (
        make_media_table,
        media_perceptual_hashes,
        media_phash_dup_clusters,
    )
    from flink_etl_spark.session import get_spark
    from flink_etl_spark.sources.tables import load_table
    from tools.replicate_testdata import build_replica
    from tools.shuffle_probe import _fmt_bytes, _shuffle_totals

    if not points_list:
        points_list = [10, 30, 90]
    spark = get_spark(
        app_name="tail-probe-phash-clusters",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"
    for n in sorted(points_list):
        out = tempfile.mkdtemp(prefix=f"sf01x{n}_phcl_")
        build_replica(spark, src, out, n, tables=("documents",))
        docs = load_table(spark, out, "documents")
        media = make_media_table(docs).select(
            "media_id", "payload"
        ).localCheckpoint(eager=True)
        n_media = media.count()
        nd = (
            media_perceptual_hashes(media)
            .select("dcthash").distinct().count()
        )
        # r14: interleaved arms — the classical q=1 banding (the r13
        # rung, measured exponent 1.49 at 30x->90x) vs the census-
        # driven generalized pigeonhole (auto_chunks). Same session,
        # same replica, same counts; the auto arm also reports the
        # width the census chose.
        for arm, kw in (
            ("classical", {"auto_chunks": False}),
            ("auto", {"auto_chunks": True}),
        ):
            st: dict = {}
            spark.catalog.clearCache()
            b0, _ = _shuffle_totals(sc)
            t0 = time.perf_counter()
            clusters = media_phash_dup_clusters(
                media, max_hamming=8, hash_col="dcthash", _stats=st, **kw
            )
            n_clusters = clusters.select("cluster_id").distinct().count()
            wall = time.perf_counter() - t0
            b1, _ = _shuffle_totals(sc)
            print(
                f"  {n}x [{arm}]: media={n_media} distinct_sigs={nd} "
                f"clusters={n_clusters} wall={wall:.1f}s "
                f"shuffle={_fmt_bytes(b1 - b0)} "
                f"n_chunks={st.get('n_chunks')} combos={st.get('combos')}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--query" in argv:
        i = argv.index("--query")
        qname = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
        if qname == "join_multiway":
            run_join_multiway([int(a) for a in argv])
        elif qname == "media_phash":
            run_media_phash([int(a) for a in argv])
        elif qname == "media_phash_recall":
            run_media_phash_recall([int(a) for a in argv])
        elif qname == "media_phash_clusters":
            run_media_phash_clusters([int(a) for a in argv])
        else:
            raise SystemExit(f"unknown --query {qname!r}")
    else:
        main([int(a) for a in argv])
