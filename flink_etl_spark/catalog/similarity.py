"""Similarity-search catalog queries over `embeddings`."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import _t, query
from flink_etl_spark.functions.vectors import (
    duckdb_cosine,
    duckdb_dot,
    duckdb_quantize,
)
from flink_etl_spark.operators import similarity as S

#: oracle twins for the quantize_int8 gate arm
_DQ = duckdb_quantize("embedding")

#: deterministic FIXED-SIZE query set: the 32 smallest vec_ids. A
#: corpus-proportional predicate (the r1 `vec_id % 50 = 0`) makes the
#: exact-kNN baseline O(N^2/50) — at 100 TB the query set of any
#: brute-force scoring pass must be O(1)-sized; the gates enforce that
#: shape by construction now.
#: interpolated into BOTH the Spark filters and every oracle's SQL
#: (some sites as `e.{QUERY_PRED}`, so it must stay a single predicate
#: on vec_id) — editing it here updates all arms together; a hardcoded
#: copy in one oracle would silently desynchronize that gate.
QUERY_PRED = "vec_id < 32"


@query(
    "knn_bruteforce_cosine",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE {QUERY_PRED}),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               round({duckdb_cosine('qv', 'cv')}, 6) AS cos_sim
        FROM c CROSS JOIN q
        WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM scored) t
    WHERE rnk <= 10
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 per query vector (fixed 32-query set).
    Broadcast query set, corpus never shuffles, WindowGroupLimit top-k."""
    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.expr(QUERY_PRED))
    return S.cosine_topk(embs, queries, k=10)


_SIGNLSH_SINGLE_SQL = f"""
    WITH planes AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS plane_id,
               embedding AS plane
        FROM embeddings ORDER BY vec_id LIMIT 4
    ),
    buckets AS (
        SELECT e.vec_id,
               CAST(sum(CASE WHEN {duckdb_dot('e.embedding', 'p.plane')} > 0
                             THEN 1 << p.plane_id ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes p
        GROUP BY e.vec_id
    ),
    q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, b.bucket
          FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id
          WHERE e.{QUERY_PRED}),
    c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, b.bucket
          FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id),
    scored AS (
        SELECT q.query_id, c.neighbor_id,
               round({duckdb_cosine('q.qv', 'c.cv')}, 6) AS cos_sim
        FROM c JOIN q ON c.bucket = q.bucket AND q.query_id <> c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM scored) t
    WHERE rnk <= 5
"""

_SIGNLSH_MULTIPROBE_SQL = f"""
    WITH planes AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS plane_id,
               embedding AS plane
        FROM embeddings ORDER BY vec_id LIMIT 4
    ),
    buckets AS (
        SELECT e.vec_id,
               CAST(sum(CASE WHEN {duckdb_dot('e.embedding', 'p.plane')} > 0
                             THEN 1 << p.plane_id ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes p
        GROUP BY e.vec_id
    ),
    flip AS (
        SELECT vec_id, plane_id AS flip_p
        FROM (SELECT e.vec_id, p.plane_id,
                     row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY round(abs({duckdb_dot('e.embedding', 'p.plane')}), 6),
                                  p.plane_id) AS r
              FROM embeddings e CROSS JOIN planes p
              WHERE e.{QUERY_PRED}) t
        WHERE r = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, bucket AS q_bucket
        FROM buckets WHERE {QUERY_PRED}
        UNION
        SELECT f.vec_id, xor(b.bucket, CAST(1 << f.flip_p AS BIGINT))
        FROM flip f JOIN buckets b ON b.vec_id = f.vec_id
    ),
    q AS (SELECT qp.query_id, qp.q_bucket, e.embedding AS qv
          FROM qprobe qp JOIN embeddings e ON e.vec_id = qp.query_id),
    c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, b.bucket
          FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id),
    scored AS (
        SELECT DISTINCT q.query_id, c.neighbor_id,
               round({duckdb_cosine('q.qv', 'c.cv')}, 6) AS cos_sim
        FROM c JOIN q ON c.bucket = q.q_bucket AND q.query_id <> c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM scored) t
    WHERE rnk <= 5
"""


@query(
    "ann_signlsh_topk",
    f"""
    SELECT 'single' AS variant, s.* FROM ({_SIGNLSH_SINGLE_SQL}) s
    UNION ALL
    SELECT 'multiprobe' AS variant, m.* FROM ({_SIGNLSH_MULTIPROBE_SQL}) m
    """,
)
def ann_signlsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN top-5: 4 data-derived hyperplanes -> 16
    buckets. The 100 TB path — corpus shuffles once by bucket instead
    of cross-joining. Both probe strategies gated (former gates
    `ann_signlsh_topk` + `ann_signlsh_multiprobe`, folded):

    * variant 'single' — search only the query's own bucket;
    * variant 'multiprobe' — n_probe=1: each query also searches the
      bucket across its lowest-margin hyperplane (Lv et al. VLDB'07) —
      the recall knob single-bucket LSH lacks. Deterministic probe
      choice (rounded margins, plane-id tie-break) keeps the gate
      exact."""
    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.expr(QUERY_PRED))
    single = S.signlsh_topk(embs, queries, k=5, n_planes=4).select(
        F.lit("single").alias("variant"), "*"
    )
    multi = S.signlsh_topk_multiprobe(
        embs, queries, k=5, n_planes=4, n_probe=1
    ).select(F.lit("multiprobe").alias("variant"), "*")
    return single.unionByName(multi)


_IVF_SQL = f"""
    WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
               embedding AS centroid
        FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    casgn AS (
        SELECT vec_id AS neighbor_id, cell_id
        FROM (SELECT e.vec_id, p.cell_id,
                     row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY round({duckdb_cosine('e.embedding', 'p.centroid')}, 6)
                                  DESC, p.cell_id) AS r
              FROM embeddings e CROSS JOIN cents p) t
        WHERE r <= 1
    ),
    qasgn AS (
        SELECT vec_id AS query_id, cell_id
        FROM (SELECT e.vec_id, p.cell_id,
                     row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY round({duckdb_cosine('e.embedding', 'p.centroid')}, 6)
                                  DESC, p.cell_id) AS r
              FROM embeddings e CROSS JOIN cents p
              WHERE e.{QUERY_PRED}) t
        WHERE r <= 2
    ),
    scored AS (
        SELECT DISTINCT q.query_id, c.neighbor_id,
               round({duckdb_cosine('qe.embedding', 'ce.embedding')}, 6) AS cos_sim
        FROM qasgn q
        JOIN casgn c ON c.cell_id = q.cell_id AND q.query_id <> c.neighbor_id
        JOIN embeddings qe ON qe.vec_id = q.query_id
        JOIN embeddings ce ON ce.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM scored) t
    WHERE rnk <= 5
"""




def _duckdb_l2sq(a: str, b: str) -> str:
    """Oracle twin of operators/similarity._l2sq (same zip shape as
    duckdb_dot)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


#: PQ-ADC oracle: m=8 subspaces, n_codes=16 seed codebooks (the
#: n_codes smallest-id normalized vectors' subvectors — refine_iters
#: pinned 0), per-subspace argmin with (rounded dist, code_id)
#: tie-break, ADC score cos ~ 1 - dist/2 — mirroring
#: operators/similarity.pq_topk(m=8, n_codes=16, rerank=1)
_PQ_M = 8
_PQ_CODES = 16
_PQ_SQL = f"""
    WITH pnv AS (
        SELECT vec_id,
               CASE WHEN sqrt({duckdb_dot('embedding', 'embedding')}) = 0
                    THEN embedding::DOUBLE[]
                    ELSE list_transform(
                        embedding::DOUBLE[],
                        x -> x / sqrt({duckdb_dot('embedding', 'embedding')}))
               END AS nv
        FROM embeddings
    ),
    pdim AS (SELECT CAST(len(nv) // {_PQ_M} AS INT) AS d FROM pnv LIMIT 1),
    pseeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code_id, nv
        FROM pnv ORDER BY vec_id LIMIT {_PQ_CODES}
    ),
    pcb AS (
        SELECT CAST(s.i AS INT) AS sub_id, code_id,
               nv[s.i*d+1 : s.i*d+d] AS cw
        FROM pseeds, pdim, UNNEST(generate_series(0, {_PQ_M - 1})) AS s(i)
    ),
    psub AS (
        SELECT vec_id, CAST(s.i AS INT) AS sub_id,
               nv[s.i*d+1 : s.i*d+d] AS sv
        FROM pnv, pdim, UNNEST(generate_series(0, {_PQ_M - 1})) AS s(i)
    ),
    passign AS (
        SELECT vec_id, sub_id, code_id
        FROM (SELECT p.vec_id, p.sub_id, c.code_id,
                     row_number() OVER (
                         PARTITION BY p.vec_id, p.sub_id
                         ORDER BY round({_duckdb_l2sq('p.sv', 'c.cw')}, 6),
                                  c.code_id) AS r
              FROM psub p JOIN pcb c USING (sub_id)) t
        WHERE r = 1
    ),
    padc AS (
        SELECT qs.vec_id AS query_id, a.vec_id AS neighbor_id,
               sum({_duckdb_l2sq('qs.sv', 'c.cw')}) AS dist
        FROM (SELECT * FROM psub WHERE {QUERY_PRED}) qs
        JOIN passign a ON a.sub_id = qs.sub_id AND a.vec_id <> qs.vec_id
        JOIN pcb c ON c.sub_id = a.sub_id AND c.code_id = a.code_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cos_sim, rnk
    FROM (SELECT query_id, neighbor_id,
                 round(1.0 - dist / 2.0, 6) AS cos_sim,
                 row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY round(1.0 - dist / 2.0, 6) DESC,
                              neighbor_id) AS rnk
          FROM padc) t
    WHERE rnk <= 5
"""


#: IVF-PQ oracle: the composed scheme (Jégou et al. 2011 §VI) —
#: 8 seed cells (the _IVF_SQL coarse quantizer), corpus assigned
#: nprobe=1 / queries nprobe=2, PQ runs on RESIDUALS (normalized
#: vector minus normalized centroid), shared residual codebooks
#: seeded from the 16 smallest-id residuals, per-cell query distance
#: tables — mirroring operators/similarity.ivfpq_topk(n_cells=8,
#: nprobe=2, m=8, n_codes=16, rerank=1) / the staged search
_IVFPQ_CELLS = 8
_IVFPQ_NPROBE = 2
_IVFPQ_SQL = f"""
    WITH inv AS (
        SELECT vec_id,
               CASE WHEN sqrt({duckdb_dot('embedding', 'embedding')}) = 0
                    THEN embedding::DOUBLE[]
                    ELSE list_transform(
                        embedding::DOUBLE[],
                        x -> x / sqrt({duckdb_dot('embedding', 'embedding')}))
               END AS nv
        FROM embeddings
    ),
    icents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
               embedding AS centroid
        FROM embeddings ORDER BY vec_id LIMIT {_IVFPQ_CELLS}
    ),
    icnv AS (
        SELECT cell_id,
               CASE WHEN sqrt({duckdb_dot('centroid', 'centroid')}) = 0
                    THEN centroid::DOUBLE[]
                    ELSE list_transform(
                        centroid::DOUBLE[],
                        x -> x / sqrt({duckdb_dot('centroid', 'centroid')}))
               END AS cnv
        FROM icents
    ),
    icasgn AS (
        SELECT vec_id, cell_id
        FROM (SELECT e.vec_id, p.cell_id,
                     row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY round({duckdb_cosine('e.embedding', 'p.centroid')}, 6)
                                  DESC, p.cell_id) AS r
              FROM embeddings e CROSS JOIN icents p) t
        WHERE r <= 1
    ),
    iqasgn AS (
        SELECT vec_id AS query_id, cell_id
        FROM (SELECT e.vec_id, p.cell_id,
                     row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY round({duckdb_cosine('e.embedding', 'p.centroid')}, 6)
                                  DESC, p.cell_id) AS r
              FROM embeddings e CROSS JOIN icents p
              WHERE e.{QUERY_PRED}) t
        WHERE r <= {_IVFPQ_NPROBE}
    ),
    ires AS (
        SELECT a.vec_id, a.cell_id,
               list_transform(list_zip(n.nv, c.cnv), p -> p[1] - p[2]) AS rv
        FROM icasgn a
        JOIN inv n ON n.vec_id = a.vec_id
        JOIN icnv c ON c.cell_id = a.cell_id
    ),
    irdim AS (SELECT CAST(len(rv) // {_PQ_M} AS INT) AS d FROM ires LIMIT 1),
    irseeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code_id, rv
        FROM ires ORDER BY vec_id LIMIT {_PQ_CODES}
    ),
    ircb AS (
        SELECT CAST(s.i AS INT) AS sub_id, code_id,
               rv[s.i*(SELECT d FROM irdim)+1
                  : (s.i+1)*(SELECT d FROM irdim)] AS cw
        FROM irseeds, UNNEST(generate_series(0, {_PQ_M - 1})) AS s(i)
    ),
    irsub AS (
        SELECT vec_id, cell_id, CAST(s.i AS INT) AS sub_id,
               rv[s.i*(SELECT d FROM irdim)+1
                  : (s.i+1)*(SELECT d FROM irdim)] AS sv
        FROM ires, UNNEST(generate_series(0, {_PQ_M - 1})) AS s(i)
    ),
    irassign AS (
        SELECT vec_id, cell_id, sub_id, code_id
        FROM (SELECT p.vec_id, p.cell_id, p.sub_id, c.code_id,
                     row_number() OVER (
                         PARTITION BY p.vec_id, p.sub_id
                         ORDER BY round({_duckdb_l2sq('p.sv', 'c.cw')}, 6),
                                  c.code_id) AS r
              FROM irsub p JOIN ircb c USING (sub_id)) t
        WHERE r = 1
    ),
    iqres AS (
        SELECT q.query_id, q.cell_id,
               list_transform(list_zip(n.nv, c.cnv), p -> p[1] - p[2]) AS rv
        FROM iqasgn q
        JOIN inv n ON n.vec_id = q.query_id
        JOIN icnv c ON c.cell_id = q.cell_id
    ),
    iqsub AS (
        SELECT query_id, cell_id, CAST(s.i AS INT) AS sub_id,
               rv[s.i*(SELECT d FROM irdim)+1
                  : (s.i+1)*(SELECT d FROM irdim)] AS sv
        FROM iqres, UNNEST(generate_series(0, {_PQ_M - 1})) AS s(i)
    ),
    iadc AS (
        SELECT qs.query_id, a.vec_id AS neighbor_id,
               sum({_duckdb_l2sq('qs.sv', 'c.cw')}) AS dist
        FROM iqsub qs
        JOIN irassign a ON a.cell_id = qs.cell_id AND a.sub_id = qs.sub_id
                        AND a.vec_id <> qs.query_id
        JOIN ircb c ON c.sub_id = a.sub_id AND c.code_id = a.code_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cos_sim, rnk
    FROM (SELECT query_id, neighbor_id,
                 round(1.0 - dist / 2.0, 6) AS cos_sim,
                 row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY round(1.0 - dist / 2.0, 6) DESC,
                              neighbor_id) AS rnk
          FROM iadc) t
    WHERE rnk <= 5
"""


@query(
    "ann_ivf_topk",
    f"""
    SELECT 'in_memory' AS variant, a.* FROM ({_IVF_SQL}) a
    UNION ALL
    SELECT 'staged_index' AS variant, b.* FROM ({_IVF_SQL}) b
    UNION ALL
    SELECT 'pq' AS variant, p.* FROM ({_PQ_SQL}) p
    UNION ALL
    SELECT 'ivfpq' AS variant, i.* FROM ({_IVFPQ_SQL}) i
    UNION ALL
    SELECT 'ivfpq_lifecycle' AS variant, l.* FROM ({_IVFPQ_SQL}) l
    UNION ALL
    SELECT 'ivfpq_rebuilt' AS variant, r.* FROM ({_IVFPQ_SQL}) r
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN top-5: 8 data-derived cells, nprobe=2. The corpus
    shuffles once by cell; per-query work is |corpus|/cells * nprobe.
    Both index lifecycles gated (former gates `ann_ivf_topk` +
    `ann_ivf_staged`, folded; the two variants MUST be identical, and
    both arms verify against the same oracle SQL):

    * variant 'in_memory' — one-shot `ivf_topk`, centroids derived in
      the same job;
    * variant 'staged_index' — `ivf_build_index` writes centroids plus
      the cell-assigned corpus as parquet partitioned by cell_id
      (build once); `ivf_search_index` answers the query batch by
      reading ONLY probed cell partitions (partition-pruned scan) —
      the build-once/search-many 100 TB shape;
    * variant 'pq' (r7) — PRODUCT QUANTIZATION ADC top-5 (Jégou et
      al. 2011, `operators/similarity.pq_topk`): the corpus encodes
      to m=8 one-byte codes per vector (seed codebooks from the 16
      smallest-id normalized vectors, refine_iters=0 for oracle
      replication), queries precompute exact subspace distance
      tables row-locally, and a candidate costs 8 table lookups —
      the compressed-scan 100 TB path (cos_sim is the rounded ADC
      angular approximation; the production `rerank=R` exact-rescore
      stage is unit-tested, recall table in docs/SCALING.md);
    * variant 'ivfpq' (r8) — the COMPOSED billion-scale layout (Jégou
      et al. 2011 §VI / FAISS IVFPQ, `operators/similarity.ivfpq_*`):
      coarse cells route each vector, PQ encodes the RESIDUAL
      (normalized vector minus normalized centroid), and search reads
      ONLY the probed `cell_id=` partitions of byte codes. Gated on
      the STAGED lifecycle (`ivfpq_build_index` writes the index +
      `_IVFPQ_META.json` sidecar; `ivfpq_search_index` derives m from
      the sidecar and partition-prunes) — the one-shot `ivfpq_topk`
      is pinned identical by unit test. Full value oracle: the
      residual encode + per-cell ADC replicated as DuckDB CTEs.
      Since r14 the arm searches the REBUILT index (trim note in the
      body): byte-identical to a fresh full-corpus build by unit
      test, verified against the same full-corpus oracle.
    * variant 'ivfpq_lifecycle' (r10) — the MAINTAINED index end to
      end: build on the smaller-id half of the corpus, append the
      rest (frozen quantizers), re-append the same batch (the
      foreachBatch replay — anti-joined to zero), then
      `compact_ann_index` (signature-verified additive swap) and
      search. The oracle is the SAME full-corpus IVF-PQ SQL as
      'ivfpq': every quantizer seed (8 smallest-id cells, 16
      smallest-id residuals) lives in the build half, so
      build(A)+append(B) == build(A+B) exactly (the r8 unit-test
      property, now driver-gated THROUGH a replay and a compaction —
      the batch-expressible form of tools/ann_soak.py's invariant).
    * variant 'ivfpq_rebuilt' (r11) — `ivfpq_rebuild_index` chained
      off the lifecycle index (parameters from its sidecar, full
      corpus, refine=0 so the oracle's seed replication applies) and
      searched: the complete maintenance loop — build, append,
      replay, compact, REBUILD — is now gate-covered end to end."""
    from flink_etl_spark.catalog import process_workdir

    embs = _t(spark, sf_dir, "embeddings")
    queries = embs.filter(F.expr(QUERY_PRED))
    mem = S.ivf_topk(embs, queries, k=5, n_cells=8, nprobe=2).select(
        F.lit("in_memory").alias("variant"), "*"
    )
    # process-cached index dir, rebuilt (overwrite) per invocation —
    # a fresh mkdtemp per call accumulated a full index every run
    idx = f"{process_workdir('ivf_index')}/{sf_dir.strip('/').replace('/', '_')}"
    S.ivf_build_index(embs, idx, n_cells=8)
    staged = S.ivf_search_index(spark, idx, queries, k=5, nprobe=2).select(
        F.lit("staged_index").alias("variant"), "*"
    )
    pq = S.pq_topk(
        embs, queries, k=5, m=_PQ_M, n_codes=_PQ_CODES
    ).select(F.lit("pq").alias("variant"), "*")
    # the maintained-index lifecycle: build(A) + append(B) + replayed
    # append (no-op) + compaction, searched against the full-corpus
    # oracle — seeds all live in A (smallest ids), so the frozen-
    # quantizer append chain converges to the one-shot build exactly
    from flink_etl_spark.streaming.ann_sink import compact_ann_index

    life_idx = (
        f"{process_workdir('ivfpq_lifecycle')}/"
        f"{sf_dir.strip('/').replace('/', '_')}"
    )
    thr = embs.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    S.ivfpq_build_index(
        embs.filter(F.col("vec_id") <= thr), life_idx,
        n_cells=_IVFPQ_CELLS, m=_PQ_M, n_codes=_PQ_CODES,
    )
    late = embs.filter(F.col("vec_id") > thr)
    S.ivfpq_append_index(spark, late, life_idx)
    S.ivfpq_append_index(spark, late, life_idx)  # replay: appends 0
    compact_ann_index(spark, life_idx, target_files=1)
    lifecycle = S.ivfpq_search_index(
        spark, life_idx, queries, k=5, nprobe=_IVFPQ_NPROBE
    ).select(F.lit("ivfpq_lifecycle").alias("variant"), "*")
    # r11: chain the maintained-index gate through the REBUILD — the
    # last maintenance op that was unit-tested (byte-identical to
    # fresh) but never driver-gated. Parameters derive from the
    # lifecycle index's sidecar; cell_refine_iters=0 deliberately
    # (the oracle replicates the seed recipe exactly — a refined
    # quantizer is oracle-inexpressible; the refine!=0 production
    # default is probe-validated instead), so the operator warning
    # for the layout-only arm is expected and suppressed here.
    import warnings

    rebuilt_idx = (
        f"{process_workdir('ivfpq_rebuilt')}/"
        f"{sf_dir.strip('/').replace('/', '_')}"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        S.ivfpq_rebuild_index(
            spark, life_idx, rebuilt_idx, corpus=embs, cell_refine_iters=0
        )
    rebuilt = S.ivfpq_search_index(
        spark, rebuilt_idx, queries, k=5, nprobe=_IVFPQ_NPROBE
    ).select(F.lit("ivfpq_rebuilt").alias("variant"), "*")
    # r14 gate-wall trim (the verify skill's 60 s budget): the 'ivfpq'
    # variant searches the REBUILT index instead of running a separate
    # full-corpus ivfpq_build_index — the rebuild derives the same
    # seeds (8 smallest-id cells, 16 smallest-id residuals, refine=0)
    # over the same full corpus and is pinned byte-identical to a
    # fresh build by test_ivfpq_rebuild_index_equals_fresh_build, so the
    # arm verifies the identical values against the same full-corpus
    # oracle while the gate drops one redundant ~5 s build job.
    # ivfpq_build_index itself stays driver-gated through the
    # lifecycle's half-corpus build above.
    ivfpq = S.ivfpq_search_index(
        spark, rebuilt_idx, queries, k=5, nprobe=_IVFPQ_NPROBE
    ).select(F.lit("ivfpq").alias("variant"), "*")
    return (
        mem.unionByName(staged).unionByName(pq).unionByName(ivfpq)
        .unionByName(lifecycle).unionByName(rebuilt)
    )


@query(
    "embedding_normalize_stats",
    f"""
    WITH n AS (
        SELECT vec_id,
               sqrt({duckdb_dot('embedding', 'embedding')}) AS nrm,
               len(embedding) AS dim
        FROM embeddings
    )
    SELECT 'normalize' AS variant, vec_id, dim,
           round(nrm, 6) AS norm,
           round(CASE WHEN nrm = 0 THEN 0.0 ELSE 1.0 END, 6) AS unit_norm,
           CAST(NULL AS DOUBLE) AS scale,
           CAST(NULL AS BIGINT) AS sum_q,
           CAST(NULL AS BIGINT) AS sum_abs_q,
           CAST(NULL AS BIGINT) AS n_clipped,
           CAST(NULL AS DOUBLE) AS max_abs_err
    FROM n
    UNION ALL
    SELECT 'quantize_int8' AS variant, vec_id,
           len(embedding) AS dim,
           CAST(NULL AS DOUBLE) AS norm,
           CAST(NULL AS DOUBLE) AS unit_norm,
           {_DQ['scale']} AS scale,
           {_DQ['sum_q']} AS sum_q,
           {_DQ['sum_abs_q']} AS sum_abs_q,
           {_DQ['n_clipped']} AS n_clipped,
           {_DQ['max_abs_err']} AS max_abs_err
    FROM embeddings
    """,
)
def embedding_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-math gate over the embedding column, union-tagged:

    * variant 'normalize' — per-vector dim + norm, and the norm OF the
      L2-normalized vector (must be exactly 1 for non-zero vectors) —
      proves the normalize op without emitting float arrays into the
      hash.
    * variant 'quantize_int8' — symmetric absmax int8 quantization
      (functions/vectors.quantize_int8: clamp(floor(v/scale + 0.5)),
      floor not round — engine round() disagrees on exact halves),
      hashed via exact integer summaries (sum_q / sum_abs_q /
      n_clipped) plus the elementwise max reconstruction error — the
      4x storage/bandwidth lever for a 100 TB embedding corpus, and
      list cells can't enter the driver hash anyway.
    """
    from flink_etl_spark.functions.vectors import (
        dequant_max_abs_err,
        l2_normalize,
        norm as vnorm,
        quantize_int8,
        quantize_scale,
    )

    embs = _t(spark, sf_dir, "embeddings")
    normalize = embs.select(
        F.lit("normalize").alias("variant"),
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(vnorm("embedding"), 6).alias("norm"),
        F.round(vnorm(l2_normalize("embedding")), 6).alias("unit_norm"),
        F.lit(None).cast("double").alias("scale"),
        F.lit(None).cast("long").alias("sum_q"),
        F.lit(None).cast("long").alias("sum_abs_q"),
        F.lit(None).cast("long").alias("n_clipped"),
        F.lit(None).cast("double").alias("max_abs_err"),
    )
    # scale is PROJECTED first and referenced as a column: passing the
    # raw quantize_scale expression into quantize_int8 would inline the
    # whole array_max(...) under the per-element transform lambda —
    # higher-order functions evaluate interpreted with no CSE, so the
    # max would recompute for EVERY element (O(dim^2) per row)
    scaled = embs.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.col("embedding"),
        quantize_scale("embedding").alias("scale"),
    )
    q = scaled.select(
        "vec_id",
        "dim",
        "embedding",
        "scale",
        quantize_int8("embedding", F.col("scale")).alias("q"),
    )
    quant = q.select(
        F.lit("quantize_int8").alias("variant"),
        "vec_id",
        "dim",
        F.lit(None).cast("double").alias("norm"),
        F.lit(None).cast("double").alias("unit_norm"),
        "scale",
        F.aggregate(
            F.col("q"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_q"),
        F.aggregate(
            F.col("q"), F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
        ).alias("sum_abs_q"),
        F.size(F.filter(F.col("q"), lambda x: F.abs(x) == 127))
        .cast("long")
        .alias("n_clipped"),
        dequant_max_abs_err("embedding", F.col("q"), F.col("scale")).alias(
            "max_abs_err"
        ),
    )
    return normalize.unionByName(quant)
