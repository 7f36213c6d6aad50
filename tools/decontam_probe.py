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

Usage: python tools/decontam_probe.py [ladder|recall|recall_synth|all]
       [point ...]
       (default: all = recall + ladder, ladder points 10 30;
        recall_synth — the planted-paraphrase second-distribution
        table — runs only when named: it is a different corpus, not a
        rerun of the standard suite)
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
        ("ivf", {"n_cells": 16, "nprobe": 4}),
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


def run_recall_synth() -> None:
    """Second-distribution recall: a SYNTHETIC anisotropic Gaussian
    corpus with paraphrases PLANTED at controlled true cosine —
    v' = c*v + sqrt(1-c^2)*u_perp — so recall is measured per true
    similarity band rather than against whatever pairs the testdata
    happens to contain. Each band's threshold is set just under the
    band (c - 0.05): a planted pair is recalled iff its method bucket
    agrees AND the verified cosine clears the threshold, so the number
    reported is pure CANDIDATE-GENERATION recall per band."""
    import random

    from flink_etl_spark.session import get_spark

    rng = random.Random(7)
    dim = 32

    def unit(v):
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v]

    def gauss_vec():
        # anisotropic: the first 4 dims carry 4x the variance
        return unit([
            rng.gauss(0, 4.0 if i < 4 else 1.0) for i in range(dim)
        ])

    def mix(v, c):
        u = gauss_vec()
        d = sum(a * b for a, b in zip(u, v))
        perp = [a - d * b for a, b in zip(u, v)]
        pn = sum(x * x for x in perp) ** 0.5
        perp = [x / pn for x in perp]
        s = (1 - c * c) ** 0.5
        return [c * a + s * b for a, b in zip(v, perp)]

    spark = get_spark(app_name="decontam-recall-synth")
    spark.sparkContext.setLogLevel("ERROR")
    bench_rows = [(i, gauss_vec()) for i in range(400)]
    corpus_rows = [(10_000 + i, gauss_vec()) for i in range(4000)]
    bands = [0.95, 0.9, 0.8, 0.7, 0.6, 0.5]
    planted = {}  # (band) -> set of corpus ids
    nxt = 100_000
    for c in bands:
        ids = set()
        for i in range(0, 400, 2):  # 200 plants per band
            planted_vec = mix(bench_rows[i][1], c)
            corpus_rows.append((nxt, planted_vec))
            ids.add(nxt)
            nxt += 1
        planted[c] = ids
    schema = "vec_id long, embedding array<float>"
    bench = spark.createDataFrame(bench_rows, schema)
    corpus = spark.createDataFrame(corpus_rows, schema)
    arms = [
        ("signlsh p=0", "signlsh", {"n_planes": 8, "n_probe": 0}),
        ("signlsh p=2", "signlsh", {"n_planes": 8, "n_probe": 2}),
        ("ivf np=1", "ivf", {"n_cells": 16, "nprobe": 1}),
        ("ivf np=4", "ivf", {"n_cells": 16, "nprobe": 4}),
    ]
    print("true-cos band | " + " | ".join(a[0] for a in arms), flush=True)
    for c in bands:
        thr = c - 0.05
        cols = [f"{c:13}"]
        for _, method, kw in arms:
            got = {
                r.id_a
                for r in _pairs(spark, corpus, bench, method,
                                threshold=thr, **kw).collect()
            }
            # exclude chance near-dups among the base corpus: measure
            # ONLY the planted ids of this band
            hit = len(got & planted[c]) / len(planted[c])
            cols.append(f"{hit:11.3f}")
        print(" | ".join(cols), flush=True)
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    modes = ("ladder", "recall", "recall_synth", "all")
    mode = args[0] if args else "all"
    if mode not in modes:
        # a typo must not silently launch the full multi-replica suite
        raise SystemExit(f"unknown mode {mode!r}; expected one of {modes}")
    pts = [int(a) for a in args[1:] if a.isdigit()]
    if mode in ("recall", "all"):
        run_recall()
    if mode == "recall_synth":
        run_recall_synth()
    if mode in ("ladder", "all"):
        run_ladder(pts or None)
