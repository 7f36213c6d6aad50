#!/usr/bin/env python
"""Capture `.explain("formatted")` for every bench headline entry into
plans/<tag>/<name>_<suffix>.txt — the before/after evidence artifact for
optimization rounds.

Usage: python tools/plan_capture.py <tag> <suffix> [entry ...]
e.g.   python tools/plan_capture.py r14 before
       python tools/plan_capture.py r14 after bpe_fit media_phash_pairs
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_etl_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name=f"plan-capture-{tag}")
    from flink_etl_spark import queries as Q

    catalog = Q.queries()
    for entry in HEADLINE:
        name, fn = entry if isinstance(entry, tuple) else (entry, catalog[entry])
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure, don't abort the sweep
            plan = f"ERROR capturing plan: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
