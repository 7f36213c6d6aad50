"""BPE scale probes (r13): measured evidence for docs/SCALING.md.

Two measurements, both on sf0.01 documents:

* ``fit [R] [B ...]`` — batched merge selection (`bpe_fit
  batch_merges=B`) vs the classical B=1 loop at a production-ish
  vocabulary. The raw corpus has only 31 distinct pre-tokens (~107
  possible merges), so the probe widens it Heaps-style by suffixing
  every token with doc_id % 211 (~6.5k distinct pre-tokens, ~50k merge
  capacity) — the fit itself is untouched. Reports rounds + wall per
  batch size; correctness of batching is pinned separately
  (test_bpe_fit_batched_* + the hypothesis property).

* ``encode [R ...]`` — the vocab-plan encode wall at real merge-table
  sizes (default 32768 — the r12 verdict asked for a MEASURED row to
  replace the ~85 s extrapolation from R=8192). Merge tables are the
  real fitted merges padded with never-matching pairs (the
  test_bpe_encode_depth_bounds fixture pattern): the replace-chain cost
  is per merge REGARDLESS of whether it matches, so padding measures
  the true per-merge cost without needing a 32k-capacity corpus.

Usage: python tools/bpe_probe.py fit 1024 1 16 16f 64 [--latency MS] [--fused]
       (a batch size suffixed 'f' runs that arm with batch_verify="fused")
       python tools/bpe_probe.py encode 8192 32768
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from flink_etl_spark.session import get_spark  # noqa: E402
from flink_etl_spark.operators import text as T  # noqa: E402

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _wide_docs(spark):
    """Heaps-widened corpus: suffix every token with doc_id % 211."""
    return _docs(spark).select(
        "doc_id",
        F.expr(
            "regexp_replace(coalesce(text, ''), '(\\\\w+)', "
            "concat('$1', CAST(doc_id % 211 AS STRING)))"
        ).alias("text"),
    )


def run_fit(
    r: int, batches: list[int], latency_s: float = 0.0,
    fused: bool = False,
) -> None:
    """``latency_s`` (r14, the r13 verdict's ask) injects a per-ROUND
    scheduling latency — the documented real-cluster stage-cycle cost
    (driver round-trip + stage scheduling + executor wakeup, typically
    200-500 ms on a busy 1000-executor cluster) that local[32] hides.
    Injection point: one sleep per `_bpe_pair_counts` call, which the
    fit loop issues exactly once per driver round. With latency the
    batched fit's round reduction becomes wall time directly; without
    it the probe reports the ANALYTIC crossover latency per batch
    size, L* = (wall_B - wall_1) / (rounds_1 - rounds_B): a cluster
    whose per-round cost exceeds L* wins by batching."""
    spark = get_spark(app_name="bpe-probe-fit")
    docs = _wide_docs(spark).localCheckpoint(eager=True)
    n_tok = docs.select(
        F.explode(F.expr(
            f"regexp_extract_all(coalesce(text, ''), '{T._BPE_PRETOKEN_SQL}', 0)"
        )).alias("t")
    ).distinct().count()
    print(
        f"widened corpus: {n_tok} distinct pre-tokens, R={r}, "
        f"injected per-round latency={latency_s * 1000:.0f}ms"
    )
    if latency_s > 0:
        orig_pair_counts = T._bpe_pair_counts
        orig_truncate = T._bpe_truncate_batch

        def _laggy_pair_counts(words):
            time.sleep(latency_s)
            return orig_pair_counts(words)

        def _laggy_truncate(words, accepted, known_products=None,
                            stats=None):
            # the verify scan is a SECOND driver job on rounds where
            # it fires — sleep once per actual job (the collision
            # early-return issues none), detected via the stats
            # counter the real function increments
            before = (stats or {}).get("verify_jobs", 0)
            out = orig_truncate(
                words, accepted, known_products=known_products,
                stats=stats,
            )
            if stats is not None and stats.get("verify_jobs", 0) > before:
                time.sleep(latency_s)
            return out

        T._bpe_pair_counts = _laggy_pair_counts
        T._bpe_truncate_batch = _laggy_truncate
    base = None
    base_wall = base_rounds = None
    try:
        for spec in batches:
            arm_fused = fused or str(spec).endswith("f")
            b = int(str(spec).rstrip("f"))
            st: dict = {}
            t0 = time.time()
            merges = T.bpe_fit(
                docs, r, batch_merges=b,
                batch_verify="fused" if arm_fused else "lazy", stats=st,
            )
            rows = [
                (x["rank"], x["left"], x["right"], x["pair_count"])
                for x in merges.orderBy("rank").collect()
            ]
            wall = time.time() - t0
            jobs = st["rounds"] + st.get("verify_jobs", 0)
            if base is None:
                base = rows
                base_wall, base_rounds = wall, jobs
            tag = "" if rows == base else "  !! MERGE TABLE DIVERGED !!"
            xover = ""
            if latency_s == 0 and base_rounds is not None and b > 1:
                if jobs < base_rounds:
                    # L* over driver JOBS (pair-count + verify), the
                    # quantity a real cluster's round-trips price
                    lstar = (wall - base_wall) / (base_rounds - jobs)
                    xover = f" crossover_latency={lstar * 1000:.0f}ms/job"
                else:
                    xover = (
                        f" jobs>=B1({base_rounds}) — batching never"
                        " wins at this depth"
                    )
            print(
                f"  B={b:>4}{'f' if arm_fused else ' '}:"
                f" rounds={st['rounds']:>5}"
                f" verify_jobs={st.get('verify_jobs', 0)}"
                f" jobs={jobs}"
                f" merges={st['n_merges']}"
                f" wall={wall:7.1f}s"
                f" rounds/merge={st['rounds'] / max(st['n_merges'], 1):.2f}"
                f" prefix_stops={st.get('prefix_stops')}"
                f" ub_stops={st.get('ub_stops')}{xover}{tag}",
                flush=True,
            )
    finally:
        if latency_s > 0:
            T._bpe_pair_counts = orig_pair_counts
            T._bpe_truncate_batch = orig_truncate


def run_encode(sizes: list[int]) -> None:
    spark = get_spark(app_name="bpe-probe-encode")
    docs = _docs(spark).localCheckpoint(eager=True)
    real = [
        (x["rank"], x["left"], x["right"], 0)
        for x in T.bpe_fit(docs, 64, vocab_partitions=1)
        .orderBy("rank").collect()
    ]
    for r in sizes:
        pad = [(i, f"zq{i}", f"xj{i}", 0) for i in range(100, 100 + r - len(real))]
        merges = real + pad
        t0 = time.time()
        out = T.bpe_encode(docs, merges, method="vocab")
        n = out.agg(F.sum("n_tokens")).collect()[0][0]
        wall = time.time() - t0
        print(
            f"  R={r:>6}: wall={wall:7.1f}s  tokens={n}"
            f"  s/1k-merges={wall / (r / 1000):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args or args[0] not in ("fit", "encode"):
        print(__doc__)
        sys.exit(2)
    if args[0] == "fit":
        latency_s = 0.0
        if "--latency" in args:
            i = args.index("--latency")
            latency_s = float(args[i + 1]) / 1000.0  # ms -> s
            args = args[:i] + args[i + 2:]
        fused = "--fused" in args
        if fused:
            args.remove("--fused")
        r = int(args[1]) if len(args) > 1 else 1024
        batches = list(args[2:]) or [1, 16, 64]
        run_fit(r, batches, latency_s=latency_s, fused=fused)
    else:
        sizes = [int(a) for a in args[1:]] or [32768]
        run_encode(sizes)
