#!/usr/bin/env python
"""PQ / IVF-PQ recall ladder at bench scale (sf0.1, 2k vectors, the 32
fixed queries) vs exact brute-force cosine — the measurement behind
DEPLOYMENT.md's rerank sizing guidance (the r7 table was sf0.001/500
vectors; corpus size changes both the ADC collision rate and what a
given R*k shortlist can recover).

Prints one JSON line:
    {"sf_dir": ..., "n_vectors": N, "pq": [{m, n_codes, rerank,
     recall_at_5, floats_per_query}, ...], "ivfpq": [{n_cells, nprobe,
     m, n_codes, rerank, recall_at_5}, ...]}

Usage: python tools/pq_recall.py [--sf-dir DIR]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_etl_spark.session import get_spark  # noqa: E402
from flink_etl_spark.operators import similarity as S  # noqa: E402
from flink_etl_spark.sources.tables import load_table  # noqa: E402

K = 5
QUERY_PRED = "vec_id < 32"
RERANKS = [1, 2, 4, 8, 20]


def pairs(df) -> set[tuple]:
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    spark = get_spark(app_name="pq-recall")
    spark.sparkContext.setLogLevel("ERROR")
    embs = load_table(spark, sf_dir, "embeddings")
    qs = embs.filter(QUERY_PRED)
    n_vecs = embs.count()
    exact = pairs(S.cosine_topk(embs, qs, k=K))

    pq_rows = []
    for m, n_codes in ((8, 32), (16, 32)):
        cbs = S.pq_codebooks(embs, m=m, n_codes=n_codes)
        codes = S.pq_encode(embs, cbs, m=m)
        for r in RERANKS:
            got = pairs(S.pq_topk(
                embs, qs, k=K, m=m, n_codes=n_codes,
                codebooks=cbs, codes=codes, rerank=r,
            ))
            pq_rows.append({
                "m": m, "n_codes": n_codes, "rerank": r,
                "recall_at_5": round(len(got & exact) / len(exact), 3),
                "floats_per_query": r * K,
            })
            print(f"# pq m={m} n_codes={n_codes} R={r}: "
                  f"{pq_rows[-1]['recall_at_5']}", file=sys.stderr)

    ivfpq_rows = []
    for nprobe in (1, 2, 4):
        for r in (1, 8):
            got = pairs(S.ivfpq_topk(
                embs, qs, k=K, n_cells=8, nprobe=nprobe, m=8, n_codes=32,
                rerank=r,
            ))
            ivfpq_rows.append({
                "n_cells": 8, "nprobe": nprobe, "m": 8, "n_codes": 32,
                "rerank": r,
                "recall_at_5": round(len(got & exact) / len(exact), 3),
            })
            print(f"# ivfpq nprobe={nprobe} R={r}: "
                  f"{ivfpq_rows[-1]['recall_at_5']}", file=sys.stderr)

    print(json.dumps({
        "sf_dir": sf_dir, "n_vectors": n_vecs, "k": K,
        "pq": pq_rows, "ivfpq": ivfpq_rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
