"""Semantic-decontamination probe: the two measurements behind the
operator's 100 TB story (results recorded in docs/SCALING.md
"Semantic decontamination").

1. LADDER (corpus grows, benchmark FIXED — the real deployment shape:
   the eval suite does not grow with the crawl): corpus = the full
   embedding set of a 1x/10x/30x join-consistent replica
   (tools/replicate_testdata.py), benchmark = the BASE sf0.1
   vec_id % 7 == 0 slice. For method="signlsh" (production knobs
   n_planes=8, n_probe=2) and method="exact", report wall
   (best-of-2 cold-cache noop) and shuffle bytes (statusStore deltas,
   the tools/shuffle_probe.py method). The designed shape: signlsh
   shuffle bytes are BENCHMARK-sized and ~flat across the ladder (the
   corpus never shuffles — plan-pinned in tests/test_plans.py), wall
   ~linear in the corpus; exact is the same scan with m cosines per
   row, so its wall carries the full verify-all constant.

2. RECALL vs the exact arm at sf0.1: corpus = ALL embeddings,
   benchmark = the vec_id % 7 == 0 slice — so every benchmark vector
   has its EXACT copy planted in the corpus (verbatim leakage, the
   contamination case that matters most), plus the corpus's own
   0.35-0.5 near-dup band as the paraphrase stand-in. Sign-LSH misses
   pairs a hyperplane confidently separates, so recall RISES with the
   contamination threshold (identical vectors share every sign bit —
   verbatim-copy recall is 1.0 by construction) and with probes. The
   table is the tuning guidance for the knobs the operator exposes.

Usage: python tools/decontam_probe.py [ladder|recall|all] [point ...]
       (default: all, ladder points 10 30)
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
THRESH = 0.8
PLANES = 8
PROBE = 2


def _pairs(spark, corpus, bench, method, **kw):
    from flink_etl_spark.operators.dedup import semantic_contamination_pairs

    return semantic_contamination_pairs(
        corpus, bench, kw.pop("threshold", THRESH), method=method,
        max_bench_rows=None, **kw,
    )


def run_ladder(points_list: list[int] | None = None) -> None:
    from flink_etl_spark.session import get_spark
    from flink_etl_spark.sources.tables import load_table
    from tools.replicate_testdata import build_replica
    from tools.shuffle_probe import _fmt_bytes, _shuffle_totals

    points_list = sorted(points_list or [10, 30])
    spark = get_spark(
        app_name="decontam-probe",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    bench = load_table(spark, BASE, "embeddings").filter("vec_id % 7 = 0")

    points = {1: BASE}
    for n in points_list:
        out = tempfile.mkdtemp(prefix=f"sf01x{n}_dec_")
        t0 = time.perf_counter()
        build_replica(spark, BASE, out, n, tables=("embeddings",))
        print(f"built {n}x embeddings replica in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        points[n] = out

    for method, kw in (
        ("signlsh", {"n_planes": PLANES, "n_probe": PROBE}),
        ("exact", {}),
    ):
        walls, bts = {}, {}
        for n, d in sorted(points.items()):
            corpus = load_table(spark, d, "embeddings")
            spark.catalog.clearCache()
            b0, _ = _shuffle_totals(sc)
            t0 = time.perf_counter()
            _pairs(spark, corpus, bench, method, **kw).write.format(
                "noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            b1, _ = _shuffle_totals(sc)
            bts[n] = b1 - b0
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _pairs(spark, corpus, bench, method, **kw).write.format(
                "noop").mode("overwrite").save()
            walls[n] = min(w, time.perf_counter() - t0)
            print(f"  {method} @ {n}x: {walls[n]:.2f}s, "
                  f"shuffle {_fmt_bytes(bts[n])}", flush=True)
        ns = sorted(points)
        for a, b in zip(ns, ns[1:]):
            exp = math.log(walls[b] / walls[a]) / math.log(b / a)
            br = (bts[b] / bts[a]) if bts[a] else float("inf")
            print(f"  {method} {a}x->{b}x: wall exp {exp:.2f}, "
                  f"byte ratio {br:.2f}", flush=True)
    spark.stop()


def run_recall() -> None:
    from flink_etl_spark.session import get_spark
    from flink_etl_spark.sources.tables import load_table

    spark = get_spark(app_name="decontam-recall")
    spark.sparkContext.setLogLevel("ERROR")
    embs = load_table(spark, BASE, "embeddings")
    corpus = embs  # the benchmark slice leaks verbatim into the corpus
    bench = embs.filter("vec_id % 7 = 0")
    print("threshold | exact_pairs | lsh(p=0) | lsh(p=1) | lsh(p=2) | "
          "flagged-id lsh(p=2) | ivf(np=1) | ivf(np=4) | ivf(np=8)",
          flush=True)
    for t in (0.35, 0.4, 0.5, 0.9):
        exact = set(
            (r.id_a, r.id_b)
            for r in _pairs(spark, corpus, bench, "exact",
                            threshold=t).collect()
        )
        if not exact:
            print(f"{t:9} | 0 | - | - | - | -", flush=True)
            continue
        exact_ids = {a for a, _ in exact}
        cols = [f"{t:9} | {len(exact):11}"]
        for p in (0, 1, 2):
            got = set(
                (r.id_a, r.id_b)
                for r in _pairs(spark, corpus, bench, "signlsh",
                                threshold=t, n_planes=PLANES,
                                n_probe=p).collect()
            )
            assert got <= exact, "lsh emitted a non-exact pair"
            cols.append(f"{len(got) / len(exact):11.3f}")
            if p == 2:
                got_ids = {a for a, _ in got}
                cols.append(f"{len(got_ids) / len(exact_ids):11.3f}")
        for npb in (1, 4, 8):
            got = set(
                (r.id_a, r.id_b)
                for r in _pairs(spark, corpus, bench, "ivf",
                                threshold=t, n_cells=16,
                                nprobe=npb).collect()
            )
            assert got <= exact, "ivf emitted a non-exact pair"
            cols.append(f"{len(got) / len(exact):11.3f}")
        print(" | ".join(cols), flush=True)
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    mode = args[0] if args and args[0] in ("ladder", "recall", "all") else "all"
    pts = [int(a) for a in args[1:] if a.isdigit()]
    if mode in ("recall", "all"):
        run_recall()
    if mode in ("ladder", "all"):
        run_ladder(pts or None)
