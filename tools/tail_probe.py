"""Tail probe: stretch the scale ladder PAST the 10x replica for the
two queries with the largest 10x scaling exponents (r4:
`semdedup_keepers` 0.38, `decontaminate_ngrams` 0.37) and measure
whether the exponents flatten on the 10x -> 30x step — the spot-check
that has to hold before anyone believes the 100x claim.

Both points are built and timed IN THE SAME SESSION (docs + embeddings
only — the other tables are irrelevant to these two operators), so the
exponent is an apples-to-apples log3 ratio:

    exp(10x -> 30x) = log(t_30x / t_10x) / log(3)

Methodology matches tools/scale_probe.py: join-consistent replicas
(`tools/replicate_testdata.py` — copy-distinct text substitutions, 52
available, so 30x carries NO cross-copy duplicate cliques), best-of-2
cold-cache noop-sink runs, auto knobs throughout (no hand tuning at
either scale).

Usage: python tools/tail_probe.py [replicas=30]
Results are recorded in docs/SCALING.md ("30x tail probe" section).
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(replicas: int = 30) -> None:
    from flink_etl_spark.operators.dedup import semdedup
    from flink_etl_spark.operators.prep import decontaminate
    from flink_etl_spark.session import get_spark
    from flink_etl_spark.sources.tables import load_table
    from tools.replicate_testdata import build_replica

    spark = get_spark(app_name="tail-probe")
    spark.sparkContext.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"

    points = {}
    for n in (10, replicas):
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
        exp = math.log(times[replicas] / times[10]) / math.log(replicas / 10)
        print(f"  {name} exp(10x->{replicas}x) = {exp:.2f}", flush=True)

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


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
