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
    n_docs_s = docs.count()
    n_embs_s = embs.count()
    run("dedup_minhash_lsh", D.minhash_near_dups(docs, threshold=0.8))
    run(
        "dedup_minhash_staged",
        D.minhash_near_dups(docs, threshold=0.8, staged_path=f"{work}/profile"),
    )
    # knobs derived from the corpus count (operators/knobs.py): the
    # r2 probe hand-picked 48 bits / 8 planes here; auto sizing now
    # reproduces corpus-appropriate knobs with no per-corpus tuning
    # (docs/SCALING.md records what fixed gate defaults cost off-scale)
    from flink_etl_spark.operators.knobs import (
        ivf_auto_cells, signlsh_auto_planes, simhash_auto_bits,
    )
    print(f"  auto knobs: simhash_bits={simhash_auto_bits(n_docs_s)} "
          f"signlsh_planes={signlsh_auto_planes(n_embs_s)} "
          f"ivf_cells={ivf_auto_cells(n_embs_s)}")
    # both hash_fns at the same auto width: the correlated near-miss
    # tail is hash-dependent (docs/SCALING.md) — the margined auto knob
    # must keep BOTH bounded with no hand tuning
    from flink_etl_spark.operators.prep import span_dedup, substring_dedup

    def run_noop(name, df):
        # count() would let Catalyst ELIMINATE the whole rebuild (left
        # join against unique-keyed drop-lists + unreferenced columns
        # prune to a bare scan count); the noop sink forces the full
        # plan like bench.py does
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {name}: full plan / {time.time() - t0:.1f}s", flush=True)
        spark.catalog.clearCache()

    # every doc is a 5-clique member -> every anchor key repeats 5x and
    # ~4/5 of all tokens get dropped: maximal drop-list volume for the
    # rebuild join (r6)
    run_noop("span_dedup_global",
             span_dedup(docs, span_tokens=20, scope="global"))
    run_noop("substring_dedup_exact", substring_dedup(docs, min_tokens=50))
    run_noop("substring_dedup_winnow8",
             substring_dedup(docs, min_tokens=50, winnow=8))
    run("dedup_simhash_hamming_auto",
        D.simhash_near_dups(docs, max_hamming=2, bits="auto", n_docs=n_docs_s))
    run("dedup_simhash_hamming_auto_charfold",
        D.simhash_near_dups(docs, max_hamming=2, bits="auto", n_docs=n_docs_s,
                            hash_fn="charfold"))
    run("dedup_embedding_lsh_auto",
        D.embedding_near_dups_lsh(embs, threshold=0.35, n_planes="auto",
                                  n_probe=1, n_vecs=n_embs_s))
    run("ann_ivf_topk_auto",
        S.ivf_topk(embs, queries32, k=5, n_cells="auto", nprobe=2,
                   n_vecs=n_embs_s))
    run("ann_signlsh_multiprobe_auto",
        S.signlsh_topk_multiprobe(embs, queries32, k=5, n_planes="auto",
                                  n_probe=1, n_vecs=n_embs_s))
    S.ivf_build_index(embs, f"{work}/ivf", n_cells="auto", n_vecs=n_embs_s)
    run("ann_ivf_staged_search",
        S.ivf_search_index(spark, f"{work}/ivf", queries32, k=5, nprobe=2))

    # adversarial duplicate clique: ONE document replicated 1000x (a
    # boilerplate page at crawl scale). Every band bucket it touches
    # holds >=1000 docs -> ~500k candidate pairs per band unbounded;
    # max_bucket drops those buckets and bounds candidate volume while
    # ordinary pairs (small buckets) are untouched.
    one = docs0.limit(1)
    clique = None
    for i in range(1000):
        part = one.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000 + i))
        clique = part if clique is None else clique.unionByName(part)
    adv = docs.unionByName(clique)
    adv.write.mode("overwrite").parquet(f"{work}/adv.parquet")
    adv = spark.read.parquet(f"{work}/adv.parquet")
    prof = D.minhash_profile(adv).filter(F.col("n_sh") > 0)
    t0 = time.time()
    n_capped = D.lsh_candidates(
        prof.drop("shset"), max_bucket=200
    ).count()
    t_capped = time.time() - t0
    print(f"  clique_1000_capped(max_bucket=200): {n_capped} candidate pairs "
          f"/ {t_capped:.1f}s (uncapped lower bound: 499500 clique pairs alone)")
    spark.catalog.clearCache()
    run("dedup_minhash_lsh_capped_clique",
        D.minhash_near_dups(adv, threshold=0.8, max_bucket=200))
    n_adv = adv.count()
    run("dedup_simhash_capped_clique(max_bucket=200)",
        D.simhash_near_dups(adv, max_hamming=2, bits="auto", n_docs=n_adv,
                            max_bucket=200))
    # the HOT-ANCHOR scenario substring_dedup's min-struct aggregate is
    # designed for: one document's anchors repeated 1000x (~50k-row hot
    # keys). A window-based first-occurrence would funnel every copy of
    # each hot key through one reducer; the aggregate partial-combines
    # map-side and the probe join is AQE-skew-splittable (r6)
    run_noop("substring_dedup_clique_1000x",
             substring_dedup(adv, min_tokens=50))

    # recall@5 vs nprobe, seed vs refined centroids: IVF recall against
    # the exact brute-force baseline over the same 32-query set
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(embs, queries32, k=5).collect()
    }
    print("  ivf recall@5 (32 queries, auto cells):")
    for refine in (0, 2):
        for nprobe in (1, 2, 4, 8):
            got = {
                (r.query_id, r.neighbor_id)
                for r in S.ivf_topk(
                    embs, queries32, k=5, n_cells="auto", nprobe=nprobe,
                    n_vecs=n_embs_s, refine_iters=refine,
                ).collect()
            }
            rec = len(got & exact) / len(exact)
            print(f"    refine_iters={refine} nprobe={nprobe}: "
                  f"recall={rec:.3f}")
            spark.catalog.clearCache()

    # SemDeDup pair recall vs the exact all-pairs baseline: clustering
    # only loses CROSS-CELL near-dup pairs. The replicated stress
    # corpus plants exact duplicates (vec_id ≡ mod n_embs) — identical
    # vectors score identically against every centroid, so they always
    # share a cell and exact-duplicate recall is 1.0 BY CONSTRUCTION;
    # the near-dup recall line quantifies the boundary loss the flat
    # quantizer trades for its n^1.5 cost.
    # ONE O(n^2) baseline pass at the lowest threshold — the dominant
    # cost of the whole probe; the higher-threshold truth sets are
    # in-memory filters of it (scores are 6-dp rounded and monotone)
    exact_scored = [
        (r.id_a, r.id_b, r.cos_sim)
        for r in D.embedding_near_dups(
            embs, threshold=0.35, max_rows=None
        ).collect()
    ]
    for thr in (0.35, 0.6, 0.8):
        exact_pairs = {(a, b) for a, b, s in exact_scored if s >= thr}
        dup_truth = {p for p in exact_pairs if p[0] % n_embs == p[1] % n_embs}
        t0 = time.time()
        got_pairs = {
            (r.id_a, r.id_b)
            for r in D.semdedup_pairs(
                embs, threshold=thr, n_cells="auto", n_vecs=n_embs_s
            ).collect()
        }
        t_sd = time.time() - t0
        dup_got = got_pairs & dup_truth
        print(f"  semdedup pair recall (threshold {thr}, auto cells, "
              f"{t_sd:.1f}s): "
              f"all={len(got_pairs)/max(len(exact_pairs),1):.3f} "
              f"exact_duplicates={len(dup_got)/max(len(dup_truth),1):.3f} "
              f"({len(got_pairs)}/{len(exact_pairs)} pairs)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
