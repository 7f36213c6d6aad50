"""Duplicate-heavy stress: replicate sf0.1 documents/embeddings Nx with
offset ids (every doc becomes an exact N-clique member — adversarial
for near-dup operators), run the heavy dedup/ANN operators, print wall
times. Ad-hoc evidence for docs/SCALING.md; not part of the test suite.

Usage: python tools/stress_probe.py [replicas=5]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402


def main(replicas: int = 5) -> None:
    from flink_etl_spark.operators import dedup as D
    from flink_etl_spark.operators import similarity as S
    from flink_etl_spark.session import get_spark
    from flink_etl_spark.sources.tables import load_table

    spark = get_spark()
    sf = "/root/testdata/sf0.1"
    docs0 = load_table(spark, sf, "documents")
    embs0 = load_table(spark, sf, "embeddings")
    n_docs = docs0.count()
    n_embs = embs0.count()

    def replicate(df, id_col, n):
        out = None
        for i in range(n):
            off = (n_docs if id_col == "doc_id" else n_embs) * i
            part = df.withColumn(id_col, F.col(id_col) + F.lit(off))
            out = part if out is None else out.unionByName(part)
        return out

    docs = replicate(docs0, "doc_id", replicas)
    embs = replicate(embs0, "vec_id", replicas)
    work = tempfile.mkdtemp(prefix="stress_")
    docs.write.mode("overwrite").parquet(f"{work}/documents.parquet")
    embs.write.mode("overwrite").parquet(f"{work}/embeddings.parquet")
    docs = spark.read.parquet(f"{work}/documents.parquet")
    embs = spark.read.parquet(f"{work}/embeddings.parquet")
    print(f"stress corpus: {docs.count()} docs / {embs.count()} vecs ({replicas}x)")

    def run(name, df):
        t0 = time.time()
        n = df.count()
        print(f"  {name}: {n} rows / {time.time() - t0:.1f}s", flush=True)
        spark.catalog.clearCache()

    queries32 = embs.filter("vec_id < 32")
    run("dedup_minhash_lsh", D.minhash_near_dups(docs, threshold=0.8))
    run(
        "dedup_minhash_staged",
        D.minhash_near_dups(docs, threshold=0.8, staged_path=f"{work}/profile"),
    )
    # knobs sized to the corpus: 16-bit simhash / 4-plane LSH are gate
    # defaults for sf0.01; at 25k docs / 10k vecs the signature and
    # bucket spaces must grow with the data (docs/SCALING.md)
    run("dedup_simhash_hamming_48b", D.simhash_near_dups(docs, max_hamming=2, bits=48))
    run("dedup_embedding_lsh_8p",
        D.embedding_near_dups_lsh(embs, threshold=0.35, n_planes=8, n_probe=1))
    run("ann_ivf_topk", S.ivf_topk(embs, queries32, k=5, n_cells=8, nprobe=2))
    run("ann_signlsh_multiprobe",
        S.signlsh_topk_multiprobe(embs, queries32, k=5, n_planes=4, n_probe=1))
    S.ivf_build_index(embs, f"{work}/ivf", n_cells=8)
    run("ann_ivf_staged_search",
        S.ivf_search_index(spark, f"{work}/ivf", queries32, k=5, nprobe=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
