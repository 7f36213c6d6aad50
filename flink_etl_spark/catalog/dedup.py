"""Dedup catalog queries over `documents` / `embeddings`.

The MinHash/SimHash oracle SQL is generated programmatically from the
same coefficient tables the Spark operators use
(functions/hashing.py) — one source of truth for the hash math.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_etl_spark.catalog import _t, query
from flink_etl_spark.functions.hashing import (
    MERSENNE_P,
    MINHASH_COEFFS,
    SIMHASH_COEFFS,
    duckdb_char_fold_hash,
)
from flink_etl_spark.functions.vectors import duckdb_cosine, duckdb_dot
from flink_etl_spark.operators import dedup as D

# shared oracle CTE fragments ------------------------------------------------

#: distinct (doc_id, shingle) postings from token 3-shingles
SHINGLE_CTES = """
toks AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS t FROM documents),
sh AS (
    SELECT DISTINCT doc_id, s
    FROM toks, UNNEST(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
             ELSE [] END) AS u(s)
),
cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT doc_a, doc_b,
           round(shared / CAST(ca.c + cb.c - shared AS DOUBLE), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
)
"""


@query(
    "dedup_exact_docs",
    """
    SELECT min(doc_id) AS keep_id,
           count(*) AS n_copies,
           length(text) AS text_len
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by full content hash-groupBy; canonical row = min id."""
    docs = _t(spark, sf_dir, "documents")
    return D.exact_dedup(docs, ["text"], "doc_id").select(
        "keep_id", "n_copies", F.length("text").alias("text_len")
    )


@query(
    "dedup_ngram_jaccard",
    f"WITH {SHINGLE_CTES} SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.8",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-shingle) Jaccard similarity join, threshold 0.8."""
    docs = _t(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, threshold=0.8)


@query(
    "dedup_ngram_jaccard_pruned",
    """
    WITH
    toks AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, s
        FROM toks, UNNEST(
            CASE WHEN len(t) >= 3
                 THEN list_transform(range(1, len(t) - 1),
                                     i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                 ELSE [] END) AS u(s)
    ),
    hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 2),
    shp AS (SELECT sh.doc_id, sh.s FROM sh ANTI JOIN hot USING (s)),
    cnt AS (SELECT doc_id, count(*) AS c FROM shp GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM shp a JOIN shp b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(shared / CAST(ca.c + cb.c - shared AS DOUBLE), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE round(shared / CAST(ca.c + cb.c - shared AS DOUBLE), 6) >= 0.6
    """,
)
def dedup_ngram_jaccard_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df-pruned Jaccard join (max_df=2): hot shingles are anti-joined
    out before the posting self-join, capping every posting list — the
    documented stopword-shingle skew mitigation, gated. Jaccard is then
    exact over the pruned shingle space."""
    docs = _t(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, threshold=0.6, max_df=2)


def _minhash_oracle() -> str:
    perms = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_COEFFS))
    return f"""
    WITH {SHINGLE_CTES},
    wid AS (SELECT doc_id, {duckdb_char_fold_hash('s')} AS term_id FROM sh),
    perms(perm_id, a, b) AS (VALUES {perms}),
    sigs AS (
        SELECT doc_id, perm_id,
               min((term_id * a + b) % {MERSENNE_P}) AS minhash
        FROM wid CROSS JOIN perms
        GROUP BY 1, 2
    ),
    banded AS (
        SELECT doc_id, CAST(floor(perm_id / 2) AS INT) AS band_id,
               array_to_string(list_sort(list(concat(CAST(perm_id AS VARCHAR), '=',
                                                     CAST(minhash AS VARCHAR)))), ':')
                   AS band_key
        FROM sigs
        GROUP BY 1, 2
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b, j.jaccard
    FROM cands c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
    WHERE j.jaccard >= 0.8
    """


@query("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH(8 bands x 2 rows) candidates, verified
    with exact Jaccard >= 0.8. The oracle replicates the entire sketch
    pipeline — identical coefficients, dictionary, banding."""
    docs = _t(spark, sf_dir, "documents")
    return D.minhash_near_dups(docs, threshold=0.8, n_hashes=16, bands=8)


@query(
    "dedup_minhash_incremental",
    f"""
    SELECT doc_a, doc_b, jaccard FROM ({_minhash_oracle()}) mh
    WHERE doc_a % 5 = 0 OR doc_b % 5 = 0
    """,
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup shape: corpus profile (doc_id %% 5 != 0) staged
    to parquet once, then the 'daily batch' (doc_id %% 5 = 0) deduped
    against it without re-sketching the corpus. Equals the full run
    restricted to pairs touching the batch (tests prove the identity;
    the oracle IS that restriction)."""
    import atexit
    import shutil
    import tempfile

    from flink_etl_spark.operators.dedup import (
        minhash_near_dups_incremental,
        minhash_stage_profile,
    )

    docs = _t(spark, sf_dir, "documents")
    staged = tempfile.mkdtemp(prefix="mh_profile_")
    atexit.register(shutil.rmtree, staged, ignore_errors=True)
    minhash_stage_profile(docs.filter("doc_id % 5 != 0"), staged, mode="overwrite")
    return minhash_near_dups_incremental(docs.filter("doc_id % 5 = 0"), staged)


def _simhash_oracle(bits: int = 16) -> str:
    votes = ",\n               ".join(
        f"sum(CASE WHEN ((term_id * {a} + {b}) % {MERSENNE_P}) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS v{j}"
        for j, (a, b) in enumerate(SIMHASH_COEFFS[:bits])
    )
    sig = " + ".join(f"CASE WHEN v{j} > 0 THEN {2**j} ELSE 0 END" for j in range(bits))
    return f"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS t FROM documents),
    tok AS (SELECT doc_id, tk AS token FROM toks, UNNEST(t) AS u(tk)),
    wid AS (SELECT doc_id, {duckdb_char_fold_hash('token')} AS term_id FROM tok),
    votes AS (
        SELECT doc_id,
               {votes}
        FROM wid GROUP BY doc_id
    )
    SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes
    """


@query("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-16 fingerprints (bit votes over hashed token occurrences)."""
    docs = _t(spark, sf_dir, "documents")
    return D.simhash_signatures(docs, bits=16)


@query(
    "dedup_simhash_hamming",
    f"""
    WITH sigs AS ({_simhash_oracle()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming<=2 near-dup pairs via lossless pigeonhole
    banding; the oracle is the brute-force pair join the banding
    provably equals."""
    docs = _t(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, max_hamming=2, bits=16)


@query(
    "dedup_embedding_cosine",
    f"""
    WITH a AS (SELECT vec_id AS id_a, embedding AS va FROM embeddings),
         b AS (SELECT vec_id AS id_b, embedding AS vb FROM embeddings)
    SELECT id_a, id_b, round({duckdb_cosine('va', 'vb')}, 6) AS cos_sim
    FROM a JOIN b ON id_a < id_b
    WHERE round({duckdb_cosine('va', 'vb')}, 6) >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute-force exactness baseline;
    sign-LSH in similarity.py is the bucketed scale path)."""
    embs = _t(spark, sf_dir, "embeddings")
    return D.embedding_near_dups(embs, threshold=0.35)


@query(
    "dedup_embedding_lsh",
    f"""
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
              FROM embeddings e CROSS JOIN planes p) t
        WHERE r = 1
    ),
    probes AS (
        SELECT vec_id, bucket AS probe FROM buckets
        UNION
        SELECT f.vec_id, xor(b.bucket, CAST(1 << f.flip_p AS BIGINT))
        FROM flip f JOIN buckets b ON b.vec_id = f.vec_id
    ),
    cand AS (
        SELECT DISTINCT pa.vec_id AS id_a, pb.vec_id AS id_b
        FROM probes pa JOIN probes pb
          ON pa.probe = pb.probe AND pa.vec_id < pb.vec_id
    )
    SELECT id_a, id_b,
           round({duckdb_cosine('ea.embedding', 'eb.embedding')}, 6) AS cos_sim
    FROM cand
    JOIN embeddings ea ON ea.vec_id = id_a
    JOIN embeddings eb ON eb.vec_id = id_b
    WHERE round({duckdb_cosine('ea.embedding', 'eb.embedding')}, 6) >= 0.35
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via sign-LSH bucketing with one multi-probe
    flip — the corpus-scale path for `dedup_embedding_cosine`: one
    probe-bucket shuffle join generates candidates, cosine verifies
    candidates only. Nothing in the plan is quadratic in the corpus."""
    embs = _t(spark, sf_dir, "embeddings")
    return D.embedding_near_dups_lsh(
        embs, threshold=0.35, n_planes=4, n_probe=1
    )


@query(
    "dedup_exact_digest",
    """
    SELECT min(doc_id) AS keep_id,
           count(*) AS n_copies,
           digest
    FROM (SELECT doc_id, sha256(text) AS digest FROM documents)
    GROUP BY digest
    """,
)
def dedup_exact_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on a SHA-256 digest instead of full content —
    the at-scale variant of `dedup_exact_docs`: the shuffle carries
    64-byte keys, not documents. Collision probability (~n^2 / 2^257)
    is below hardware error rates; both engines compute the identical
    digest, so the oracle matches on the digest itself."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.sha2("text", 256).alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies", "digest")
    )


def _clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_oracle()}) mh
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(src, dst) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
    )
    SELECT src AS doc_id, min(dst) AS cluster_id
    FROM reach GROUP BY src
    """


@query("dedup_duplicate_clusters", _clusters_oracle())
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: connected components via
    iterative min-label propagation (a genuinely ITERATIVE distributed
    algorithm — driver loop over shuffle joins, Pregel-style). The
    oracle computes the same components with a recursive-CTE transitive
    closure: two entirely different fixpoint formulations must agree."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(docs, threshold=0.8, n_hashes=16, bands=8).select(
        "doc_a", "doc_b"
    )
    return D.duplicate_clusters(pairs)
