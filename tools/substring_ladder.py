"""Substring-dedup replica ladder: time `substring_dedup` (exact and
winnow=8 arms, min_tokens=50, hash64 keys) at 1x/10x/30x/100x of the
sf0.1 documents table — the r6 ladder extended to the literal 100x
point. The operator's designed asymptotic is LINEAR (anchor exchange,
min-struct aggregate, interval rebuild are all O(tokens)), so the
honest expectation as fixed costs amortize is exponent -> ~1.0, the
same reading the semdedup 100x probe recorded (1.08 under its 1.33
design ceiling).

Methodology matches tools/tail_probe.py: join-consistent replicas
built in-session (copy-distinct text substitutions — no cross-copy
duplicate cliques), best-of-2 cold-cache noop-sink runs.

Usage: python tools/substring_ladder.py [point ...]  (default 1 10 30 100)
Results are recorded in docs/SCALING.md (substring ladder section).
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(points_list: list[int] | None = None) -> None:
    from flink_etl_spark.operators.prep import substring_dedup
    from flink_etl_spark.session import get_spark
    from flink_etl_spark.sources.tables import load_table
    from tools.replicate_testdata import build_replica

    if not points_list:
        points_list = [1, 10, 30, 100]
    points_list = sorted(points_list)

    spark = get_spark(app_name="substring-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"

    points: dict[int, str] = {}
    for n in points_list:
        if n == 1:
            points[n] = src
            continue
        out = tempfile.mkdtemp(prefix=f"sf01x{n}_substr_")
        t0 = time.perf_counter()
        build_replica(spark, src, out, n, tables=("documents",))
        print(f"built {n}x documents replica in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        points[n] = out

    def bench(name, **kw):
        times = {}
        for n, d in points.items():
            docs = load_table(spark, d, "documents")
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                substring_dedup(docs, min_tokens=50, **kw).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[n] = best
            print(f"  {name} @ {n}x: {best:.2f}s", flush=True)
        for a, b in zip(points_list, points_list[1:]):
            exp = math.log(times[b] / times[a]) / math.log(b / a)
            print(f"  {name} exp({a}x->{b}x) = {exp:.2f}", flush=True)

    bench("substring_exact", winnow=1)
    bench("substring_winnow8", winnow=8)
    spark.stop()


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]])
