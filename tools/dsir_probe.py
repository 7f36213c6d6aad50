#!/usr/bin/env python
"""DSIR probe: (a) the scale ladder for the DSIR family — wall time of
`dsir_log_weights` (exact-id arm vs the paper's fixed-bucket arm) and
`dsir_select_n` at sf0.1 and a 10x replica — and (b) the bucketed
arm's collision impact vs the exact arm (weight deltas, rank
agreement, selection overlap) at sf0.1.

Why both live in one probe: the bucketed arm exists BECAUSE the
exact-id arm's count-table joins shuffle the entire exploded
unigram+bigram stream of the raw corpus (the one corpus-token-scale
exchange left in the prep family); the ladder shows what that costs
as data grows, and the agreement table shows what the fixed 10k-bucket
space (Xie et al. 2023's own design point) gives up for removing it.

Results are spliced into docs/SCALING.md by hand (see the "DSIR"
section there).

Usage: python tools/dsir_probe.py [--no-replica] [--replicas N]
       python tools/dsir_probe.py --sweep
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from flink_etl_spark.session import get_spark  # noqa: E402
from flink_etl_spark.sources.tables import load_table  # noqa: E402
from flink_etl_spark.operators.prep import (  # noqa: E402
    dsir_log_weights,
    dsir_select_n,
)

SF = "/root/testdata/sf0.1"
N_BUCKETS = 10_000  # the DSIR paper's bucket count
REPLICAS = 10


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _halves(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
    )


def ladder_point(spark, sf_dir: str, label: str) -> dict:
    raw, target = _halves(spark, sf_dir)
    out: dict = {"label": label, "n_docs": raw.count()}
    for arm, kw in (("exact", {}), ("bucketed", {"n_buckets": N_BUCKETS})):
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            best = min(best, _noop(dsir_log_weights(raw, target, **kw)))
        out[f"logw_{arm}_sec"] = round(best, 2)
    # select rides the bucketed weights (either arm feeds it equally)
    dw = dsir_log_weights(raw, target, n_buckets=N_BUCKETS)
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        best = min(best, _noop(dsir_select_n(dw, n=256, salt=0)))
    out["select_sec"] = round(best, 2)
    return out


def agreement(spark, n_buckets: int = N_BUCKETS) -> dict:
    """Collision impact of the fixed bucket space at sf0.1: per-doc
    weight deltas and rank/selection agreement vs the exact-id arm
    (both production xxhash64)."""
    raw, target = _halves(spark, SF)
    ex = {
        r["doc_id"]: r
        for r in dsir_log_weights(raw, target).collect()
    }
    bk = {
        r["doc_id"]: r
        for r in dsir_log_weights(
            raw, target, n_buckets=n_buckets
        ).collect()
    }
    assert set(ex) == set(bk)
    ids = sorted(ex)
    n = len(ids)
    deltas = [
        abs(ex[i]["mean_lr_micro"] - bk[i]["mean_lr_micro"]) for i in ids
    ]
    # Spearman rank correlation of logw_micro
    def ranks(d):
        order = sorted(ids, key=lambda i: (d[i]["logw_micro"], i))
        return {i: r for r, i in enumerate(order)}

    re_, rb = ranks(ex), ranks(bk)
    d2 = sum((re_[i] - rb[i]) ** 2 for i in ids)
    spearman = 1 - 6 * d2 / (n * (n * n - 1))
    overlap = {}
    for frac in (0.1, 0.25):
        k = max(1, int(n * frac))
        top = lambda d: set(
            sorted(ids, key=lambda i: (-d[i]["logw_micro"], i))[:k]
        )
        overlap[f"top{int(frac * 100)}pct_overlap"] = round(
            len(top(ex) & top(bk)) / k, 4
        )
    # the actual selection: Gumbel-top-256 under each arm's weights
    sel = lambda dw: {
        r["doc_id"]
        for r in dsir_select_n(dw, n=256, salt=0).select("doc_id").collect()
    }
    s_ex = sel(dsir_log_weights(raw, target))
    s_bk = sel(dsir_log_weights(raw, target, n_buckets=n_buckets))
    return {
        "n_docs": n,
        "n_buckets": n_buckets,
        "mean_abs_delta_mean_lr_micro": round(sum(deltas) / n, 1),
        "max_abs_delta_mean_lr_micro": round(max(deltas), 1),
        "spearman_logw": round(spearman, 4),
        **overlap,
        "gumbel_top256_overlap": round(len(s_ex & s_bk) / 256, 4),
    }


def main(with_replica: bool = True, replicas: int = REPLICAS) -> None:
    spark = get_spark(app_name="dsir-probe")
    spark.sparkContext.setLogLevel("ERROR")
    points = [(SF, "sf0.1")]
    if with_replica:
        from tools.replicate_testdata import build_replica

        rep = tempfile.mkdtemp(prefix=f"dsir{replicas}x_")
        t0 = time.perf_counter()
        build_replica(spark, SF, rep, replicas)
        print(f"built {replicas}x replica in {time.perf_counter() - t0:.0f}s",
              flush=True)
        points.append((rep, f"sf0.1x{replicas}"))

    print(json.dumps({"agreement": agreement(spark)}), flush=True)
    for sf_dir, label in points:
        print(json.dumps({"ladder": ladder_point(spark, sf_dir, label)}),
              flush=True)


def sweep() -> None:
    """Collision-impact curve over the bucket-space size: how fast the
    selection converges to the exact-id arm as B grows (the knob a
    deployment actually turns). One line per B at sf0.1."""
    spark = get_spark(app_name="dsir-probe-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for b in (1_000, 10_000, 100_000):
        print(json.dumps({"sweep": agreement(spark, n_buckets=b)}),
              flush=True)


if __name__ == "__main__":
    if "--sweep" in sys.argv[1:]:
        sweep()
    else:
        reps = REPLICAS
        if "--replicas" in sys.argv[1:]:
            reps = int(sys.argv[sys.argv.index("--replicas") + 1])
        main("--no-replica" not in sys.argv[1:], replicas=reps)
