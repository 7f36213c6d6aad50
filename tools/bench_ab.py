#!/usr/bin/env python
"""Within-session bench A/B between two repo trees (e.g. a git worktree
of a previous round vs the current tree).

Why this exists: round-over-round BENCH_r{N}.json deltas are taken on
different days on a shared host, and r6->r7 showed a uniform +29% drift
across entries whose code did not change — uninterpretable without a
same-session baseline. This tool re-anchors: it runs the COMPARABLE
subset (each tree's own `bench.HEADLINE` minus its `NON_COMPARABLE`)
in interleaved order (A B B A B A A B by default — both orderings, so
neither tree systematically inherits a warmed page cache), each run
being bench.py's own best-of-2 noop-sink execution, and reports the
per-query BEST across each tree's runs plus the A/B ratio.

Usage:
    python tools/bench_ab.py TREE_A TREE_B [--runs 4] [--sf-dir DIR]
                             [--full]

--full (r11) widens the panel from the r1-r3 comparable subset to the
ENTIRE headline set of each tree (every bench.HEADLINE entry,
NON_COMPARABLE included) — the r10 verdict's gap: twelve entries,
including the three heaviest, had never had an interleaved
adjudication. Entries are matched by name across trees, so a query
one tree lacks simply has no ratio.

Each run is a fresh subprocess (fresh JVM) with sys.path pinned to the
tree, so the two trees' packages never share a process. Output: one
JSON line {tree_a, tree_b, per_query: {name: {a, b, ratio}},
total_a, total_b, runs_a, runs_b}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

#: runs inside a subprocess with the TREE's own bench module — only the
#: comparable subset, per-query best-of-2 (bench.py's own policy)
_RUNNER = r"""
import json, os, sys, time
tree, sf_dir, full = sys.argv[1], sys.argv[2], sys.argv[3] == "full"
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 and sys.argv[4] else None
sys.path.insert(0, tree)
os.chdir(tree)
import bench
from flink_etl_spark.session import get_spark

spark = get_spark(app_name="bench-ab")
catalog = bench.Q.queries()
# warm the JVM/codegen path (same as bench.py main)
catalog["agg_pricing_summary"](spark, sf_dir).write.format("noop").mode(
    "overwrite").save()
# r14: trees whose bench carries Python (Arrow) stages also warm the
# per-core Python workers, exactly as their own bench.py main does —
# BOTH sides still measure computation, not session cold-start
if hasattr(bench, "warm_python_workers"):
    bench.warm_python_workers(spark)
timings = {}
for entry in bench.HEADLINE:
    name, fn = entry if isinstance(entry, tuple) else (entry, catalog[entry])
    if only is not None:
        if name not in only:
            continue
    elif not full and name in bench.NON_COMPARABLE:
        continue
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings[name] = round(best, 3)
print("BENCH_AB " + json.dumps(timings))
spark.stop()
"""


def run_tree(tree: str, sf_dir: str, full: bool = False,
             only: str = "") -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, sf_dir,
         "full" if full else "subset", only],
        capture_output=True, text=True, check=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_AB "):
            return json.loads(line[len("BENCH_AB "):])
    raise RuntimeError(f"no BENCH_AB line from {tree}:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tree_a")
    ap.add_argument("tree_b")
    ap.add_argument("--runs", type=int, default=4,
                    help="runs per tree (interleaved)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--full", action="store_true",
                    help="run every HEADLINE entry, not just the "
                         "r1-r3 comparable subset")
    ap.add_argument("--only", default="",
                    help="comma-separated entry names: restrict the "
                         "panel to just these (fast iteration on the "
                         "entries a change touches)")
    args = ap.parse_args()

    # both orderings: ABBA BAAB blocks, truncated to runs per tree
    pattern = ("AB" "BA" "BA" "AB" * args.runs)[: 2 * args.runs]
    runs: dict[str, list[dict[str, float]]] = {"A": [], "B": []}
    trees = {"A": args.tree_a, "B": args.tree_b}
    for i, side in enumerate(pattern):
        t = run_tree(trees[side], args.sf_dir, full=args.full,
                     only=args.only)
        runs[side].append(t)
        print(f"# run {i + 1}/{len(pattern)} [{side}] "
              f"total={round(sum(t.values()), 2)}", file=sys.stderr)

    names = sorted(set().union(*(r.keys() for r in runs["A"] + runs["B"])))
    per_query = {}
    for n in names:
        a = min((r[n] for r in runs["A"] if n in r), default=None)
        b = min((r[n] for r in runs["B"] if n in r), default=None)
        per_query[n] = {
            "a": a, "b": b,
            "ratio_b_over_a": round(b / a, 3) if a and b else None,
        }
    total_a = round(sum(q["a"] for q in per_query.values() if q["a"]), 3)
    total_b = round(sum(q["b"] for q in per_query.values() if q["b"]), 3)
    print(json.dumps({
        "tree_a": args.tree_a, "tree_b": args.tree_b,
        "sf_dir": args.sf_dir, "pattern": pattern, "full": args.full,
        "per_query": per_query,
        "total_a": total_a, "total_b": total_b,
        "ratio_b_over_a": round(total_b / total_a, 3) if total_a else None,
        "runs_a": runs["A"], "runs_b": runs["B"],
    }))


if __name__ == "__main__":
    main()
