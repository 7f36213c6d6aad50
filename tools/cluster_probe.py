"""Connected-components probe: min-label propagation vs
large-star/small-star (Kiveris et al. 2014) on the two graph shapes
that matter for duplicate clustering at scale.

Why this exists (r11): the r10 verdict's top finding was that the
propagation loop converges in O(cluster diameter) rounds and used to
exit `max_iters` SILENTLY — a chain-shaped duplicate cluster (template
chains in crawl data) longer than the round budget returned
non-component labels with no error. r11 made the exit loud and added
the star arm; this probe turns the "O(log n) rounds" claim into a
measurement:

* CHAIN — a single path graph of diameter N: the adversarial shape.
  Propagation needs ~N rounds (we run it only at small N to show the
  linear growth); star's rounds must grow ~log N.
* CLIQUEY — K near-clique clusters of size S with a few random
  internal edges each, the shape real near-dup pairs produce:
  propagation converges in a handful of rounds and is the cheaper arm
  per round; star must converge in a similar handful.

Both arms share the same localCheckpoint-per-round lineage cut, so
rounds x per-round-cost is the whole story. Wall times are same-
session best-of-1 (each round is dominated by small shuffles; the
ROUND COUNT is the signal, not the milliseconds).

Usage: python tools/cluster_probe.py
Results recorded in docs/SCALING.md ("Duplicate clustering: rounds").
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def chain_pairs(spark, n: int):
    """Path graph 0-1-...-n: diameter n."""
    return spark.range(n).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )


def cliquey_pairs(spark, k: int, s: int, edges_per_node: int = 3):
    """K clusters of size S; each node pairs with `edges_per_node`
    hash-picked members of its own cluster — near-cliques, the shape
    minhash/simhash/cosine pairs actually have."""
    base = spark.range(k * s).select(
        F.col("id").alias("doc_a"),
        (F.col("id") / s).cast("long").alias("_c"),
    )
    out = None
    for j in range(edges_per_node):
        part = base.select(
            "doc_a",
            (
                F.col("_c") * s
                + F.pmod(F.xxhash64(F.col("doc_a") + F.lit(j * 7919)),
                         F.lit(s))
            ).alias("doc_b"),
        ).filter(F.col("doc_a") != F.col("doc_b"))
        out = part if out is None else out.unionByName(part)
    return out


def run(name, pairs, algorithm, max_iters):
    from flink_etl_spark.operators.dedup import duplicate_clusters

    stats: dict = {}
    t0 = time.perf_counter()
    try:
        df = duplicate_clusters(
            pairs, max_iters=max_iters, algorithm=algorithm, _stats=stats
        )
        n_clusters = df.select("cluster_id").distinct().count()
        wall = time.perf_counter() - t0
        print(
            f"  {name:28s} {algorithm:11s} rounds={stats.get('rounds'):3d} "
            f"converged={stats.get('converged')} clusters={n_clusters} "
            f"wall={wall:.1f}s",
            flush=True,
        )
        return stats.get("rounds")
    except RuntimeError as e:
        wall = time.perf_counter() - t0
        assert "did not converge" in str(e)
        print(
            f"  {name:28s} {algorithm:11s} rounds={stats.get('rounds'):3d} "
            f"NON-CONVERGED (loud, as designed) wall={wall:.1f}s",
            flush=True,
        )
        return None


def main() -> None:
    from flink_etl_spark.session import get_spark

    spark = get_spark(app_name="cluster-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print("chain (adversarial diameter):", flush=True)
    star_rounds = {}
    for n in (64, 1024, 16384):
        star_rounds[n] = run(
            f"chain n={n}", chain_pairs(spark, n), "star", max_iters=64
        )
    # star growth must be ~log: rounds(16384)/rounds(64) far under
    # the 256x a linear-in-diameter algorithm would need
    r64, r16k = star_rounds[64], star_rounds[16384]
    print(
        f"  star rounds growth 64->16384 (256x diameter): "
        f"{r64} -> {r16k} ({r16k / r64:.1f}x; log2 ratio would be "
        f"{math.log2(16384) / math.log2(64):.1f}x)",
        flush=True,
    )
    # propagation: linear in diameter — show it at small n, and the
    # LOUD non-convergence past the budget
    run("chain n=64", chain_pairs(spark, 64), "propagation", max_iters=70)
    run("chain n=128 (budget 70)", chain_pairs(spark, 128),
        "propagation", max_iters=70)

    print("cliquey (the realistic near-dup shape):", flush=True)
    pairs = cliquey_pairs(spark, k=2000, s=50)
    run("2000 cliques x 50", pairs, "propagation", max_iters=20)
    run("2000 cliques x 50", pairs, "star", max_iters=20)
    spark.stop()


if __name__ == "__main__":
    main()
