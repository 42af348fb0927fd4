"""Gradeable queries + DuckDB oracles for the training-data pipeline
operators (dedup / similarity / quality).  Registered via entry_queries.

Portability notes: h60 = md5-prefix hash (hashing.py) is computed
identically in both engines; minhash (a,b) constants and LSH hyperplanes
are python-generated literals shared by both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .textops import dedup, quality, similarity
from .textops.hashing import MINHASH_P, h60_sql, minhash_params, minhash_sql

# shared analyzer CTE (same as entry_queries.TOKS_CTE but with the token
# ARRAY kept per doc, for shingles/fingerprints)
TOKARR_CTE = """
tokarr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(regexp_replace(regexp_replace(text,
             '[^\\p{L}\\p{Nd}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +'),
             t -> t <> '') AS toks
  FROM documents
)
"""

NGRAM_N = 3
MH_HASHES = 8
SIMHASH_BITS = 16
JACCARD_THRESHOLD = 0.5
EMB_K = 15
EMB_BITS = 4
#: graded skew guards (mirrored literally in the SQL oracles): shingles in
#: more than NGRAM_MAX_DF docs are dropped before pair generation; LSH
#: band buckets larger than LSH_MAX_BUCKET are dropped before the
#: bucket self-join
NGRAM_MAX_DF = 100
LSH_MAX_BUCKET = 200
LSH_BANDS = 4
LSH_ROWS_PER_BAND = MH_HASHES // LSH_BANDS


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import entry_queries as EQ

    return EQ.load_documents(spark, sf_dir)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import entry_queries as EQ

    path = f"{sf_dir}/embeddings.parquet"
    return EQ._spread(spark.read.parquet(path), cache_key=path)


# --- exact dedup -----------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the synthetic corpus has no byte-identical full texts; dedup on the
    # 120-char prefix so the operator's group/canonical path produces rows
    docs = _docs(spark, sf_dir).select("doc_id", F.substring("text", 1, 120).alias("text"))
    return dedup.exact_duplicates(docs, "text", "doc_id").select(
        "content_sha",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
    )


SQL_DEDUP_EXACT = """
SELECT sha256(substr(text, 1, 120)) AS content_sha,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS canonical_id
FROM documents GROUP BY sha256(substr(text, 1, 120)) HAVING count(*) >= 2
"""


# --- n-gram jaccard --------------------------------------------------------

SHINGLE_CTE = f"""
{TOKARR_CTE},
sh AS (
  SELECT DISTINCT doc_id AS id, shingle FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) < {NGRAM_N} THEN []
                  ELSE list_transform(range(len(toks) - {NGRAM_N} + 1),
                       i -> array_to_string(list_slice(toks, i + 1, i + {NGRAM_N}), ' '))
                  END) AS shingle
    FROM tokarr)
)
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), "text", "doc_id", n=NGRAM_N,
        threshold=JACCARD_THRESHOLD, max_shingle_df=NGRAM_MAX_DF,
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 4).alias("jaccard"),
    )


#: shingles after the df cap (sizes stay on the full table `sh`)
SHP_CTE = f"""
shp AS (
  SELECT sh.id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= {NGRAM_MAX_DF}) k USING (shingle)
)
"""

SQL_NGRAM_JACCARD = f"""
WITH {SHINGLE_CTE},
{SHP_CTE},
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM shp a JOIN shp b USING (shingle)
  WHERE a.id < b.id GROUP BY 1, 2
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       round(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= {JACCARD_THRESHOLD}
"""


# --- minhash signatures ----------------------------------------------------

def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dedup.minhash_signatures(
        _docs(spark, sf_dir), "text", "doc_id", n=NGRAM_N, num_hashes=MH_HASHES
    )
    return sigs.select(F.col("id").cast("long").alias("id"),
                       *[F.col(f"mh_{i}").cast("long").alias(f"mh_{i}") for i in range(MH_HASHES)])


def _sig_mins() -> str:
    params = minhash_params(MH_HASHES, seed=42)
    h = h60_sql("shingle")
    return ",\n       ".join(
        f"CAST(min({minhash_sql(h, a, b)}) AS BIGINT) AS mh_{i}"
        for i, (a, b) in enumerate(params)
    )


def _sql_minhash() -> str:
    return f"""
WITH {SHINGLE_CTE}
SELECT CAST(id AS BIGINT) AS id,
       {_sig_mins()}
FROM sh GROUP BY id
"""


# --- minhash+LSH full dedup pipeline ----------------------------------------

def q_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline graded end-to-end: signatures -> capped band buckets
    -> candidate pairs -> candidate-restricted exact-Jaccard verify."""
    out = dedup.minhash_lsh_dedup(
        _docs(spark, sf_dir), "text", "doc_id",
        n=NGRAM_N, num_hashes=MH_HASHES, bands=LSH_BANDS,
        threshold=JACCARD_THRESHOLD, seed=42,
        max_shingle_df=NGRAM_MAX_DF, max_bucket_size=LSH_MAX_BUCKET,
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 4).alias("jaccard"),
    )


def _sql_lsh_pairs_chain() -> str:
    """CTE chain (no WITH keyword) ending in ``lshpairs(id_a, id_b,
    jaccard)`` — the minhash+LSH near-dup pairs.  Shared by the
    pairwise gate and the connected-components gate."""
    band_rows = "\n  UNION ALL ".join(
        "SELECT id, {b} AS band, concat_ws('_', {cols}) AS bkey FROM sig".format(
            b=b,
            cols=", ".join(
                f"CAST(mh_{b * LSH_ROWS_PER_BAND + r} AS VARCHAR)"
                for r in range(LSH_ROWS_PER_BAND)
            ),
        )
        for b in range(LSH_BANDS)
    )
    return f"""{SHINGLE_CTE.strip()},
{SHP_CTE.strip()},
sig AS (
  SELECT id, {_sig_mins()}
  FROM sh GROUP BY id
),
bandkeys AS (
  {band_rows}
),
kept AS (
  SELECT bk.id, bk.band, bk.bkey FROM bandkeys bk
  JOIN (SELECT band, bkey FROM bandkeys GROUP BY band, bkey
        HAVING count(*) <= {LSH_MAX_BUCKET}) ok USING (band, bkey)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM kept a JOIN kept b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM shp a JOIN shp b USING (shingle)
  WHERE a.id < b.id GROUP BY 1, 2
),
lshpairs AS (
  SELECT c.id_a, c.id_b, i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
  FROM cand c
  JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
  JOIN sizes sa ON sa.id = c.id_a
  JOIN sizes sb ON sb.id = c.id_b
  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= {JACCARD_THRESHOLD}
)"""


def _sql_minhash_lsh_dedup() -> str:
    """Oracle: same semantics, simpler shape (full-pair jaccard ∩
    candidates) — equality with the Spark candidate-restricted plan is
    exactly the point of the gate."""
    return f"""
WITH {_sql_lsh_pairs_chain()}
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       round(jaccard, 4) AS jaccard
FROM lshpairs
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the minhash+LSH
    near-dup pairs (min-reachable-id labeling) — the step between
    pairwise near-dup output and keep-one-per-cluster filtering."""
    pairs = dedup.minhash_lsh_dedup(
        _docs(spark, sf_dir), "text", "doc_id",
        n=NGRAM_N, num_hashes=MH_HASHES, bands=LSH_BANDS,
        threshold=JACCARD_THRESHOLD, seed=42,
        max_shingle_df=NGRAM_MAX_DF, max_bucket_size=LSH_MAX_BUCKET,
    )
    comp = dedup.connected_components(pairs.select("id_a", "id_b"))
    return comp.select(F.col("id").cast("long").alias("doc_id"),
                       F.col("component").cast("long").alias("component"))


def _sql_dedup_components() -> str:
    return f"""
WITH RECURSIVE {_sql_lsh_pairs_chain()},
und AS (SELECT id_a AS a, id_b AS b FROM lshpairs
        UNION SELECT id_b, id_a FROM lshpairs),
reach(id, m) AS (
  SELECT a, a FROM und
  UNION
  SELECT u.a, r.m FROM und u JOIN reach r ON r.id = u.b
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(m) AS BIGINT) AS component
FROM reach GROUP BY id
"""


def q_near_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSITIVE keep-one-per-cluster: drop every doc whose near-dup
    component canonical (min reachable id) is another doc — the filter a
    training pipeline applies after clustering (pairwise dedup_keep
    can't drop B and C of a chain A~B~C consistently; components can).
    Returns the surviving doc ids."""
    pairs = dedup.minhash_lsh_dedup(
        _docs(spark, sf_dir), "text", "doc_id",
        n=NGRAM_N, num_hashes=MH_HASHES, bands=LSH_BANDS,
        threshold=JACCARD_THRESHOLD, seed=42,
        max_shingle_df=NGRAM_MAX_DF, max_bucket_size=LSH_MAX_BUCKET,
    )
    comp = dedup.connected_components(pairs.select("id_a", "id_b"))
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id"))
    kept = _docs(spark, sf_dir).select("doc_id").join(losers, "doc_id", "left_anti")
    return kept.select(F.col("doc_id").cast("long").alias("doc_id"))


def _sql_near_dedup_keep() -> str:
    return f"""
WITH RECURSIVE {_sql_lsh_pairs_chain()},
und AS (SELECT id_a AS a, id_b AS b FROM lshpairs
        UNION SELECT id_b, id_a FROM lshpairs),
reach(id, m) AS (
  SELECT a, a FROM und
  UNION
  SELECT u.a, r.m FROM und u JOIN reach r ON r.id = u.b
),
comp AS (SELECT id, min(m) AS component FROM reach GROUP BY id)
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
"""


# --- simhash ---------------------------------------------------------------

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir), "text", "doc_id", bits=SIMHASH_BITS).select(
        F.col("id").cast("long").alias("id"), F.col("simhash").cast("long").alias("simhash")
    )


def _sql_simhash() -> str:
    h = h60_sql("tok")
    sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN tf ELSE -tf END) AS s_{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS))
    return f"""
WITH {TOKARR_CTE},
tf AS (
  SELECT doc_id AS id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tok FROM tokarr)
  GROUP BY 1, 2
),
hashed AS (SELECT id, tf, {h} AS h FROM tf),
bits AS (SELECT id, {sums} FROM hashed GROUP BY id)
SELECT CAST(id AS BIGINT) AS id, CAST({fp} AS BIGINT) AS simhash FROM bits
"""


SIMHASH_MAX_HAMMING = 2


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded SimHash near-dup: pigeonhole band blocking + xor
    popcount verify — never an all-pairs scan.  Oracle computes the
    same pair set by brute force; equality of the banded plan with the
    exhaustive definition is exactly the gate."""
    # cap OFF here: the oracle is uncapped brute force, and 16-bit
    # fingerprints on >1k docs overflow any bucket cap by pigeonhole —
    # at scale you raise `bits` with corpus size rather than cap
    out = dedup.simhash_near_dup_pairs(
        _docs(spark, sf_dir), "text", "doc_id",
        bits=SIMHASH_BITS, max_hamming=SIMHASH_MAX_HAMMING,
        max_bucket_size=None,
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def _sql_simhash_near_dup() -> str:
    h = h60_sql("tok")
    sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN tf ELSE -tf END) AS s_{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS))
    return f"""
WITH {TOKARR_CTE},
tf AS (
  SELECT doc_id AS id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tok FROM tokarr)
  GROUP BY 1, 2
),
hashed AS (SELECT id, tf, {h} AS h FROM tf),
bits AS (SELECT id, {sums} FROM hashed GROUP BY id),
fps AS (SELECT id, CAST({fp} AS BIGINT) AS sh FROM bits)
SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM fps a JOIN fps b ON a.id < b.id
WHERE bit_count(xor(a.sh, b.sh)) <= {SIMHASH_MAX_HAMMING}
"""


# --- embedding cosine top-k ------------------------------------------------

_QVEC_CACHE: dict[str, list[float]] = {}


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    if sf_dir not in _QVEC_CACHE:
        row = _emb(spark, sf_dir).filter(F.col("vec_id") == 0).collect()[0]
        _QVEC_CACHE[sf_dir] = [float(x) for x in row.embedding]
    return _QVEC_CACHE[sf_dir]


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _query_vec(spark, sf_dir)
    out = similarity.cosine_topk(_emb(spark, sf_dir), qv, k=EMB_K)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.round("cosine", 4).alias("cosine"))


SQL_COSINE_TOPK = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), q.qv)
           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.qv, q.qv))) AS c
  FROM embeddings CROSS JOIN q
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, round(c, 4) AS cosine
FROM scored ORDER BY c DESC, vec_id ASC LIMIT {EMB_K}
"""


EMB_DIM = 64  # testdata embeddings dimension (validated at query time)
_PLANES = similarity.hyperplanes(EMB_DIM, EMB_BITS)


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _query_vec(spark, sf_dir)
    out = similarity.lsh_cosine_topk(_emb(spark, sf_dir), qv, k=EMB_K, bits=EMB_BITS)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.round("cosine", 4).alias("cosine"))


def _sql_lsh_topk() -> str:
    """Static SQL oracle: buckets ALL vectors (incl. the query, vec_id=0)
    with the same literal hyperplanes, restricts to the query's bucket."""
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(e, {_lit_list(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES)
    )
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
bucketed AS (SELECT vec_id, e, {bucket_terms} AS bucket FROM b),
q AS (SELECT e AS qv, bucket AS qbucket FROM bucketed WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         list_dot_product(e, q.qv) / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
  FROM bucketed CROSS JOIN q WHERE bucket = q.qbucket
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, round(c, 4) AS cosine
FROM scored ORDER BY c DESC, vec_id ASC LIMIT {EMB_K}
"""


def _lit_list(vals: list[float]) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


LSH_N_PROBE = 3


def q_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH: query bucket + first two Hamming-1 neighbor
    buckets — the recall knob (result is a superset-candidate rerank of
    single-probe; at scale the probe set prunes 3 of 2^bits partitions)."""
    qv = _query_vec(spark, sf_dir)
    out = similarity.lsh_cosine_topk(_emb(spark, sf_dir), qv, k=EMB_K,
                                     bits=EMB_BITS, n_probe=LSH_N_PROBE)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.round("cosine", 4).alias("cosine"))


def _sql_lsh_multiprobe_topk() -> str:
    """Same literal hyperplanes; probe set = qbucket plus qbucket XOR 1
    and XOR 2 (the first two Hamming-1 neighbors — multiprobe_buckets)."""
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(e, {_lit_list(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES)
    )
    return f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
bucketed AS (SELECT vec_id, e, {bucket_terms} AS bucket FROM b),
q AS (SELECT e AS qv, bucket AS qbucket FROM bucketed WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         list_dot_product(e, q.qv) / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
  FROM bucketed CROSS JOIN q
  WHERE bucket IN (q.qbucket, xor(q.qbucket, 1), xor(q.qbucket, 2))
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, round(c, 4) AS cosine
FROM scored ORDER BY c DESC, vec_id ASC LIMIT {EMB_K}
"""


IVF_CENTROID_IDS = list(range(1, 9))  # data-point centroids (vec 0 is the query)
IVF_PROBE = 2


_IVF_CACHE: dict[str, str] = {}


def _ivf_layout(spark: SparkSession, sf_dir: str) -> str:
    """Build-once IVF layout (cell-partitioned vectors + centroid table),
    per-process temp dir — the graded probe reads THIS, not the corpus."""
    if sf_dir not in _IVF_CACHE:
        import os
        import tempfile

        out = os.path.join(tempfile.gettempdir(), "irs_ivf", f"pid{os.getpid()}",
                           sf_dir.strip("/").replace("/", "_"))
        similarity.write_ivf_index(_emb(spark, sf_dir), IVF_CENTROID_IDS, out)
        _IVF_CACHE[sf_dir] = out
    return _IVF_CACHE[sf_dir]


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN through the SERVING split: cells are persisted once
    as a partition column (build), the probe reads only the 2 nearest
    cells' partitions (PartitionFilters in the scan) — no per-query
    corpus-wide assignment."""
    qv = _query_vec(spark, sf_dir)
    out = similarity.ivf_topk_served(spark, _ivf_layout(spark, sf_dir), qv,
                                     k=EMB_K, n_probe=IVF_PROBE)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.round("cosine", 4).alias("cosine"))


def _sql_ivf_topk() -> str:
    cids = ", ".join(str(c) for c in IVF_CENTROID_IDS)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id IN ({cids})),
a AS (
  SELECT e.vec_id, c.cid,
         list_dot_product(e.v, c.cv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
  FROM e CROSS JOIN cent c
),
cells AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
    FROM a) WHERE rn = 1
),
qprobe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (ORDER BY cos DESC, cid ASC) AS rn
    FROM a WHERE vec_id = 0) WHERE rn <= {IVF_PROBE}
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
  FROM e JOIN cells USING (vec_id) CROSS JOIN q
  WHERE cells.cell IN (SELECT cid FROM qprobe)
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, round(c, 4) AS cosine
FROM scored ORDER BY c DESC, vec_id ASC LIMIT {EMB_K}
"""


KM_K = 4       # trained-IVF cells
KM_ITERS = 2   # FIXED Lloyd iterations (the SQL oracle replays exactly these)


def q_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED centroids (r5 verdict #3): distributed Lloyd
    k-means (deterministic h60 seed pick, assign = broadcast max_by,
    update = posexplode mean rounded to 9 dp, centroids on the driver
    between iterations — similarity.kmeans_train), then the standard
    probe: nearest {IVF_PROBE} trained cells, exact cosine within them.
    The oracle unrolls the SAME two iterations in SQL."""
    qv = _query_vec(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    cents = similarity.kmeans_train(emb, k=KM_K, iters=KM_ITERS)
    out = similarity.ivf_trained_topk(emb, cents, qv, k=EMB_K, n_probe=IVF_PROBE)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.round("cosine", 4).alias("cosine"))


def _sql_ivf_trained_topk() -> str:
    """Two unrolled Lloyd iterations; every piece mirrors the engine:
    h60 hash-order seeds (cid = 1..k), cosine assignment with
    (cos DESC, cid ASC) ties, per-component avg rounded to 9 dp,
    empty cells keep the previous centroid (coalesce)."""
    from .textops.hashing import h60_sql

    def assign(prev: str, name: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cid AS cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             c.cid ASC) AS rn
    FROM e CROSS JOIN {prev} c) WHERE rn = 1
)"""

    def update(prev: str, aname: str, name: str) -> str:
        return f"""{name} AS (
  SELECT p.cid, coalesce(u.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN (
    SELECT cell AS cid, list(m ORDER BY pos) AS cv FROM (
      SELECT cell, pos, round(avg(val), 9) AS m FROM (
        SELECT a.cell, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS val
        FROM e JOIN {aname} a USING (vec_id))
      GROUP BY cell, pos)
    GROUP BY cell) u USING (cid)
)"""

    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INT) AS cid, v AS cv
  FROM (SELECT vec_id, v, {h60_sql('CAST(vec_id AS VARCHAR)')} AS h FROM e)
  ORDER BY h, vec_id LIMIT {KM_K}
),
{assign('seeds', 'a1')},
{update('seeds', 'a1', 'c1')},
{assign('c1', 'a2')},
{update('c1', 'a2', 'c2')},
{assign('c2', 'af')},
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (ORDER BY cos DESC, cid ASC) AS rn FROM (
      SELECT c.cid,
             list_dot_product(c.cv, q.qv)
               / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
      FROM c2 c CROSS JOIN q)) WHERE rn <= {IVF_PROBE}
),
scored AS (
  SELECT e.vec_id,
         list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
  FROM e JOIN af USING (vec_id) CROSS JOIN q
  WHERE af.cell IN (SELECT cid FROM probe)
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, round(c, 4) AS cosine
FROM scored ORDER BY c DESC, vec_id ASC LIMIT {EMB_K}
"""


EMB_NEAR_DUP_THRESHOLD = 0.3  # synthetic embeddings max within-label cosine ~0.47


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucket blocking (the scale default) — NOT the semantic label
    column, and no cross-join anywhere in the plan."""
    out = similarity.embedding_near_dup_pairs(
        _emb(spark, sf_dir), threshold=EMB_NEAR_DUP_THRESHOLD,
        lsh_bits=EMB_BITS, dim=EMB_DIM,
    )
    return out.select(F.col("id_a").cast("long").alias("id_a"),
                      F.col("id_b").cast("long").alias("id_b"),
                      F.round("cosine", 4).alias("cosine"))


def _sql_emb_near_dup() -> str:
    """Same literal hyperplanes as the Spark side; pairs within one
    LSH bucket above the cosine threshold."""
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_lit_list(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES)
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {bucket_terms} AS bucket FROM e)
SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(bb.vec_id AS BIGINT) AS id_b,
       round(list_dot_product(a.v, bb.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v))), 4) AS cosine
FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
WHERE list_dot_product(a.v, bb.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v)))
      >= {EMB_NEAR_DUP_THRESHOLD}
"""


# --- quality / language / tokens / fingerprint -----------------------------

def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.language_id(_docs(spark, sf_dir), "text", "doc_id").select(
        F.col("id").cast("long").alias("id"), "en_ratio", "lang_pred"
    )


def _sql_language_id() -> str:
    markers = ", ".join(f"'{w}'" for w in quality.EN_MARKERS)
    return f"""
WITH {TOKARR_CTE},
r AS (
  SELECT doc_id AS id,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> t IN ({markers}))) * 1.0 / len(toks)
              ELSE 0.0 END AS ratio
  FROM tokarr)
SELECT CAST(id AS BIGINT) AS id, round(ratio, 4) AS en_ratio,
       CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'unknown' END AS lang_pred
FROM r
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.token_counts(_docs(spark, sf_dir), "text", "doc_id")


SQL_TOKEN_COUNTS = """
SELECT doc_id AS id,
       CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS BIGINT) AS word_tokens,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]+')) AS BIGINT) AS punct_runs
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.quality_score(_docs(spark, sf_dir), "text", "doc_id")


def _sql_quality_score() -> str:
    markers = ", ".join(f"'{w}'" for w in quality.EN_MARKERS)
    return f"""
WITH {TOKARR_CTE},
m AS (
  SELECT d.doc_id AS id,
         length(d.text) AS n_chars,
         len(t.toks) AS n_tokens,
         CASE WHEN len(t.toks) > 0
              THEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(t.toks, x -> CAST(length(x) AS BIGINT))), (a, x) -> a + x) * 1.0 / len(t.toks)
              ELSE 0.0 END AS mean_tok_len,
         CASE WHEN len(t.toks) > 0
              THEN len(list_filter(t.toks, x -> x IN ({markers}))) * 1.0 / len(t.toks)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(d.text) > 0
              THEN length(regexp_replace(d.text, '[^0-9]', '', 'g')) * 1.0 / length(d.text)
              ELSE 0.0 END AS digit_ratio
  FROM documents d JOIN tokarr t ON t.doc_id = d.doc_id)
SELECT CAST(id AS BIGINT) AS id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(mean_tok_len, 4) AS mean_tok_len,
       round(stop_ratio, 4) AS stop_ratio,
       round(digit_ratio, 4) AS digit_ratio,
       round((CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.25 ELSE 0 END)
           + (CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0 END)
           + (CASE WHEN stop_ratio >= 0.05 THEN 0.25 ELSE 0 END)
           + (CASE WHEN digit_ratio <= 0.2 THEN 0.25 ELSE 0 END), 2) AS score
FROM m
"""


#: per-quality-band keep rates (band = round(score·4)): keep ALL of the
#: top band, progressively less of lower-quality strata
SAMPLE_RATES = {0: 0.02, 1: 0.10, 2: 0.25, 3: 0.50, 4: 1.0}


def q_quality_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified deterministic sampling (training-mix
    construction): quality_score bands -> per-band keep rates decided
    by a salted id hash — reproducible, shuffle-free; see
    stats.quality_stratified_sample."""
    from .textops.stats import quality_stratified_sample

    scored = quality.quality_score(_docs(spark, sf_dir), "text", "doc_id") \
        .select("id", "score")
    out = quality_stratified_sample(scored, SAMPLE_RATES)
    return out.select(F.col("id").cast("long").alias("doc_id"), "score")


def _sql_quality_sampled() -> str:
    from .textops.hashing import h60_sql

    cases = " ".join(
        f"WHEN {b} THEN {int(round(r * 1_000_000))}"
        for b, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
WITH q AS ({_sql_quality_score()})
SELECT CAST(id AS BIGINT) AS doc_id, score
FROM q
WHERE ({h60_sql("'qsamp:' || CAST(id AS VARCHAR)")} % 1000000) <
      (CASE CAST(round(score * 4) AS INT) {cases} ELSE 0 END)
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.fingerprint(_docs(spark, sf_dir), "text", "doc_id")


SQL_FINGERPRINT = f"""
WITH {TOKARR_CTE}
SELECT doc_id AS id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(toks, x -> (ascii(substr(x, 1, 1)) * 256 + length(x)) % {quality.FP_MOD})),
         (a, x) -> (a * {quality.FP_MUL} + x) % {quality.FP_MOD}) AS fp
FROM tokarr
"""


# --- statistics / sketch / split layer --------------------------------------

KMV_K = 32


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per event_type (percentile ==
    DuckDB quantile_cont; swap to percentile_approx at 100 TB)."""
    from .textops.stats import group_quantiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = group_quantiles(ev, "value", ["event_type"])
    return out.select(
        "event_type",
        *[F.round(c, 4).alias(c) for c in ("q_25", "q_50", "q_75", "q_90")],
    )


SQL_VALUE_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS q_25,
       round(quantile_cont(value, 0.5), 4) AS q_50,
       round(quantile_cont(value, 0.75), 4) AS q_75,
       round(quantile_cont(value, 0.9), 4) AS q_90
FROM events GROUP BY event_type
"""


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic KMV distinct-users-per-event-type sketch — the
    oracle-gateable twin of approx_count_distinct (HLL++)."""
    from .textops.stats import kmv_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return kmv_distinct(ev, "user_id", ["event_type"], k=KMV_K)


def _sql_kmv_distinct() -> str:
    h = h60_sql("CAST(user_id AS VARCHAR)")
    space = float(1 << 60)
    return f"""
WITH hashed AS (SELECT DISTINCT event_type, {h} AS h FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hashed),
g AS (SELECT event_type, count(*) AS n,
             max(CASE WHEN rn = {KMV_K} THEN h END) AS kth
      FROM r GROUP BY 1)
SELECT event_type,
       CAST(least(n, {KMV_K}) AS BIGINT) AS n_seen_capped,
       round(CASE WHEN n >= {KMV_K}
                  THEN {float(KMV_K - 1)} / (kth / {space})
                  ELSE CAST(n AS DOUBLE) END, 4) AS kmv_estimate
FROM g
"""


SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-range train/val/test split of the corpus —
    counts + id checksum per split (any reassignment changes both)."""
    from .textops.stats import hash_split

    docs = _docs(spark, sf_dir)
    return (
        hash_split(docs, "doc_id", SPLIT_WEIGHTS)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"),
             F.sum("doc_id").cast("long").alias("id_checksum"))
    )


def _sql_corpus_split() -> str:
    # identical thresholds to stats.split_expr: int(cum_frac * 2^60)
    space = float(1 << 60)
    t_train = int(0.8 * space)
    t_val = int((0.8 + 0.1) * space)
    h = h60_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH s AS (
  SELECT doc_id,
         CASE WHEN {h} < {t_train} THEN 'train'
              WHEN {h} < {t_val} THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM s GROUP BY split
"""


QG_MIN_SCORE = 0.5  # training-mix quality gate


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation funnel (r5 verdict #4) — the flagship
    LLM-training-data pipeline as one lazily-planned flow:

      quality_score -> gate (score >= {QG_MIN_SCORE})
        -> transitive near-dedup keep (MinHash LSH pairs -> connected
           components -> drop non-canonical members)
        -> quality-stratified deterministic sample (per-band rates)
        -> deterministic hash split (train/val/test)

    Output: one row per surviving doc (doc_id, score, split).  Only the
    component step iterates (pointer-jumping, O(log n) rounds); every
    other stage is a pure column expression / join fused into a single
    plan — no intermediate materialization, no RNG anywhere, so the mix
    is reproducible at any scale and any partitioning."""
    from .textops.stats import hash_split, quality_stratified_sample

    docs = _docs(spark, sf_dir)
    scored = quality.quality_score(docs, "text", "doc_id").select("id", "score")
    pairs = dedup.minhash_lsh_dedup(
        docs, "text", "doc_id",
        n=NGRAM_N, num_hashes=MH_HASHES, bands=LSH_BANDS,
        threshold=JACCARD_THRESHOLD, seed=42,
        max_shingle_df=NGRAM_MAX_DF, max_bucket_size=LSH_MAX_BUCKET,
    )
    comp = dedup.connected_components(pairs.select("id_a", "id_b"))
    losers = comp.filter(F.col("id") != F.col("component")).select("id")
    kept = (
        scored.filter(F.col("score") >= QG_MIN_SCORE)
        .join(losers, "id", "left_anti")
    )
    sampled = quality_stratified_sample(kept, SAMPLE_RATES)
    out = hash_split(sampled, "id", SPLIT_WEIGHTS)
    return out.select(F.col("id").cast("long").alias("doc_id"), "score", "split")


def _sql_training_mix() -> str:
    from .textops.hashing import h60_sql

    space = float(1 << 60)
    t_train = int(SPLIT_WEIGHTS["train"] * space)
    t_val = int((SPLIT_WEIGHTS["train"] + SPLIT_WEIGHTS["val"]) * space)
    cases = " ".join(
        f"WHEN {b} THEN {int(round(r * 1_000_000))}"
        for b, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
WITH RECURSIVE {_sql_lsh_pairs_chain()},
und AS (SELECT id_a AS a, id_b AS b FROM lshpairs
        UNION SELECT id_b, id_a FROM lshpairs),
reach(id, m) AS (
  SELECT a, a FROM und
  UNION
  SELECT u.a, r.m FROM und u JOIN reach r ON r.id = u.b
),
comp AS (SELECT id, min(m) AS component FROM reach GROUP BY id),
q AS ({_sql_quality_score()}),
qualified AS (
  SELECT id, score FROM q
  WHERE score >= {QG_MIN_SCORE}
    AND id NOT IN (SELECT id FROM comp WHERE id <> component)
),
sampled AS (
  SELECT id, score FROM qualified
  WHERE ({h60_sql("'qsamp:' || CAST(id AS VARCHAR)")} % 1000000) <
        (CASE CAST(round(score * 4) AS INT) {cases} ELSE 0 END)
)
SELECT CAST(id AS BIGINT) AS doc_id, score,
       CASE WHEN {h60_sql("CAST(id AS VARCHAR)")} < {t_train} THEN 'train'
            WHEN {h60_sql("CAST(id AS VARCHAR)")} < {t_val} THEN 'val'
            ELSE 'test' END AS split
FROM sampled
"""


DECON_EVAL_MOD = 29  # doc_id % 29 == 0 -> the held-out "benchmark" docs


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the documents table: a
    deterministic eval slice (doc_id % {DECON_EVAL_MOD} == 0) stands in
    for a held-out benchmark; every remaining (train) doc sharing a word
    {NGRAM_N}-gram with it is reported with its contaminated-shingle
    count and fraction.  The eval shingle set rides a broadcast — the
    corpus-side plan is one shingle explode + two same-key aggregations,
    so the check costs one pass at any corpus scale."""
    docs = _docs(spark, sf_dir)
    ev = docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
    tr = docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
    out = dedup.decontaminate(tr, ev, "text", "doc_id", n=NGRAM_N)
    return out.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.round("overlap_frac", 4).alias("overlap_frac"),
    )


SQL_DECONTAMINATE = f"""
WITH {SHINGLE_CTE},
ev AS (SELECT DISTINCT shingle FROM sh WHERE id % {DECON_EVAL_MOD} = 0),
tr AS (SELECT id, shingle FROM sh WHERE id % {DECON_EVAL_MOD} <> 0),
sizes AS (SELECT id, count(*) AS n_shingles FROM tr GROUP BY id),
hits AS (SELECT tr.id, count(*) AS n_overlap
         FROM tr JOIN ev USING (shingle) GROUP BY tr.id)
SELECT CAST(h.id AS BIGINT) AS doc_id,
       CAST(h.n_overlap AS BIGINT) AS n_overlap,
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       round(h.n_overlap / s.n_shingles, 4) AS overlap_frac
FROM hits h JOIN sizes s ON h.id = s.id
"""


def q_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(source, lang) curation composition report: docs,
    whitespace tokens and chars per (source, lang), per source, and
    corpus-wide — the summary a training-mix run ships alongside its
    output."""
    from .textops.stats import mix_report

    out = mix_report(_docs(spark, sf_dir), ["source", "lang"])
    return out.select(
        "source", "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


SQL_MIX_REPORT = """
SELECT coalesce(source, '<all>') AS source,
       coalesce(lang, '<all>') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))) AS BIGINT) AS n_tokens,
       CAST(sum(len(text)) AS BIGINT) AS n_chars
FROM documents GROUP BY ROLLUP (source, lang)
"""


# --- multimodal binary metadata (payload = utf-8 bytes of text) -----------

def q_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal.binary_ops import attach_blob_metadata

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"), "text"
    )
    out = attach_blob_metadata(docs, "payload")
    # blob_sha is over the bytes; for a cross-engine oracle hash the string
    # (identical to hashing its UTF-8 bytes in both engines)
    return out.select(
        F.col("doc_id").cast("long").alias("id"),
        F.col("blob_size").alias("blob_size"),
        F.sha2(F.col("text"), 256).alias("sha"),
        "media_type",
    )


SQL_BLOB_METADATA = """
SELECT CAST(doc_id AS BIGINT) AS id,
       CAST(octet_length(encode(text)) AS BIGINT) AS blob_size,
       sha256(text) AS sha,
       'application/octet-stream' AS media_type
FROM documents
"""


def q_image_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-dimension extraction without codec libraries (r5
    verdict #7): deterministic PNG/JPEG payloads are synthesized from
    doc_id (valid signature + IHDR / SOI + APP0 + SOF0 bytes), then
    multimodal.binary_ops.parse_image_header reads width/height back
    from the container headers alone — the metadata pass a media
    pipeline runs before deciding what to decode.  Even ids get PNG,
    odd ids JPEG; the oracle mirrors the dimension arithmetic."""
    import pandas as pd

    from .multimodal.binary_ops import (
        attach_blob_metadata, image_header_dims, jpeg_bytes, png_bytes)

    # NOTE: no annotations — this module has `from __future__ import
    # annotations`, which turns hints into strings pandas_udf can't eval
    def mk(s):
        return s.map(lambda i: png_bytes(16 + i % 240, 16 + (i * 7) % 240)
                     if i % 2 == 0
                     else jpeg_bytes(16 + i % 240, 16 + (i * 7) % 240))

    payload = F.pandas_udf(mk, "binary")
    media = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        payload(F.col("doc_id")).alias("payload"))
    typed = attach_blob_metadata(media, "payload").select("doc_id", "payload",
                                                          "media_type")
    dims = image_header_dims(media, id_col="doc_id", binary_col="payload")
    return (
        typed.join(dims, "doc_id")
        .select("doc_id", "media_type",
                F.col("width").cast("long").alias("width"),
                F.col("height").cast("long").alias("height"))
    )


SQL_IMAGE_HEADERS = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS media_type,
       CAST(16 + doc_id % 240 AS BIGINT) AS width,
       CAST(16 + (doc_id * 7) % 240 AS BIGINT) AS height
FROM documents
"""


FRAME_EVERY_N = 10


def q_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling fan-out through the driver gate: one
    binary payload row -> many (frame_idx, frame_sha) rows via Arrow
    mapInPandas; the deterministic fake frame count/checksums let
    DuckDB mirror the exact rows (the real decoder slots into the same
    batch loop)."""
    from .multimodal.binary_ops import sample_frames

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    out = sample_frames(docs, every_n=FRAME_EVERY_N)
    return out.select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "frame_sha",
    )


SQL_FRAME_SAMPLES = f"""
WITH n AS (SELECT doc_id AS media_id, text,
                  1 + CAST(('0x' || substr(sha256(text), 5, 2)) AS INT) % 64 AS nf
           FROM documents),
fr AS (SELECT media_id, text, unnest(range(0, nf, {FRAME_EVERY_N})) AS frame_idx FROM n)
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       substr(sha256(text || ':' || CAST(frame_idx AS VARCHAR)), 1, 16) AS frame_sha
FROM fr
"""



# --- collocations: adjacent-bigram PMI --------------------------------------

PMI_MIN_COUNT = 20


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: adjacent-bigram PMI over the analyzed
    token stream, rare pairs dropped (min_count) — see
    quality.bigram_pmi for the no-self-join plan shape."""
    out = quality.bigram_pmi(_docs(spark, sf_dir), "text",
                             min_count=PMI_MIN_COUNT)
    return out.select("term_a", "term_b", F.col("n").cast("long").alias("n"),
                      F.round("pmi", 4).alias("pmi"))


def _sql_bigram_pmi() -> str:
    return f"""
WITH {TOKARR_CTE},
pairs AS (
  SELECT unnest(CASE WHEN len(toks) < 2 THEN []
                ELSE list_transform(range(len(toks) - 1),
                     i -> {{'a': toks[i + 1], 'b': toks[i + 2]}})
                END, recursive := true) AS x
  FROM tokarr
),
uni AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(toks) AS t FROM tokarr) GROUP BY t
),
bi AS (
  SELECT a AS term_a, b AS term_b, CAST(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY a, b HAVING count(*) >= {PMI_MIN_COUNT}
),
totals AS (
  SELECT CAST((SELECT CAST(sum(len(toks)) AS BIGINT) FROM tokarr) AS DOUBLE) AS nu,
         CAST((SELECT CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) FROM tokarr) AS DOUBLE) AS nb
)
SELECT b.term_a, b.term_b, b.n,
       -- "+ 0" canonicalizes IEEE -0.0 (a tiny negative PMI rounds to
       -- DuckDB's -0.0 but Spark's +0.0; the driver's hash distinguishes)
       round(ln((b.n / t.nb) / ((ca.c / t.nu) * (cb.c / t.nu))) / ln(2), 4) + 0 AS pmi
FROM bi b
JOIN uni ca ON ca.t = b.term_a
JOIN uni cb ON cb.t = b.term_b
CROSS JOIN totals t
"""

# --- per-doc tf-idf keyword extraction ---------------------------------------

KEYWORDS_K = 3


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 keywords by tf·log2(N/df) over the shared
    index tables — see quality.tfidf_keywords for the one-window-
    shuffle plan shape and the round(·,9) cut convention."""
    from . import entry_queries as EQ

    ix = EQ.get_index(spark, sf_dir)
    out = quality.tfidf_keywords(ix.postings, ix.terms,
                                 ix.stats["n_docs"], k=KEYWORDS_K)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "term",
        F.col("rank").cast("long").alias("rank"),
        F.round("w", 4).alias("w"),
    )


def _sql_tfidf_keywords() -> str:
    # derives toks from the LOCAL token-array CTE: importing
    # entry_queries.TOKS_CTE here would make entry_textops un-importable
    # on its own (entry_queries imports this module mid-init)
    return f"""
WITH {TOKARR_CTE},
toks AS (SELECT doc_id, unnest(toks) AS term FROM tokarr),
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
w AS (
  SELECT p.doc_id, p.term, p.tf * ln(n.n / f.df) / ln(2) AS w
  FROM post p JOIN dft f USING (term) CROSS JOIN n
),
rk AS (
  SELECT doc_id, term, w,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY round(w, 9) DESC, term ASC) AS rank
  FROM w
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term, CAST(rank AS BIGINT) AS rank,
       round(w, 4) AS w
FROM rk WHERE rank <= {KEYWORDS_K}
"""


# --- repetition quality signal ----------------------------------------------


def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-trigram fraction per doc (Gopher-style repetition
    filter signal) — no shuffle at all, pure column exprs."""
    out = quality.repetition_ratio(_docs(spark, sf_dir), "text", "doc_id", n=3)
    return out.select(F.col("id").cast("long").alias("doc_id"),
                      "n_grams", "rep_ratio")


SQL_REPETITION_RATIO = f"""
WITH {TOKARR_CTE},
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(len(toks) - 2),
                   i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])
              ELSE [] END AS grams
  FROM tokarr
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       round(CASE WHEN len(grams) > 0
                  THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                  ELSE 0.0 END, 4) AS rep_ratio
FROM g
"""


# --- PII redaction -----------------------------------------------------------

#: The synthetic corpus is digit-free, so the gate would be vacuous on raw
#: ``text``.  Both sides therefore append a DETERMINISTIC doc_id-derived PII
#: suffix (email + IPv4 + phone) to 2 of every 3 docs — doc_id % 3 == 0 rows
#: stay clean so zero-count rows are graded too.  No external data; the
#: augmentation is part of the gate, not the operator.
_PII_AUG_SUFFIX_SQL = """text || ' contact alice.' || CAST(doc_id AS VARCHAR)
      || '@example.org via 10.' || CAST(doc_id % 200 AS VARCHAR)
      || '.' || CAST((doc_id * 7) % 200 AS VARCHAR)
      || '.' || CAST((doc_id * 13) % 200 AS VARCHAR)
      || ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
      || '-' || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0')"""


def _pii_augmented(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    suffix = F.concat(
        F.lit(" contact alice."), d.cast("string"),
        F.lit("@example.org via 10."), (d % 200).cast("string"),
        F.lit("."), ((d * 7) % 200).cast("string"),
        F.lit("."), ((d * 13) % 200).cast("string"),
        F.lit(" tel 555-"), F.lpad((d % 1000).cast("string"), 3, "0"),
        F.lit("-"), F.lpad(((d * 3) % 10000).cast("string"), 4, "0"),
    )
    aug = F.when(d % 3 == 0, F.col("text")).otherwise(F.concat(F.col("text"), suffix))
    return docs.select("doc_id", aug.alias("text"))


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (quality.redact_pii): per-kind match counts +
    placeholder-substituted text, pure codegen'd column exprs — the
    scrub pass of a curation pipeline, scan-bound at any scale."""
    out = quality.redact_pii(_pii_augmented(_docs(spark, sf_dir)), "text", "doc_id")
    return out.select(F.col("id").cast("long").alias("doc_id"),
                      "n_email", "n_ip", "n_phone", "redacted")


def _sql_pii_redact() -> str:
    pats = {kind: pat for kind, pat, _ in quality.PII_PATTERNS}
    red = "text"
    for kind, pat, rep in quality.PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, '{pats[k]}')) AS BIGINT) AS n_{k}"
        for k in ("email", "ip", "phone")
    )
    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              ELSE {_PII_AUG_SUFFIX_SQL}
         END AS text
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  {counts},
  {red} AS redacted
FROM aug
"""


# --- per-source cap (domain balancing) ---------------------------------------

SOURCE_CAP_K = 10


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (stats.cap_per_group): keep the top-K docs per
    source under a total order — skew-safe two-phase ranking (salted
    bounded pre-rank, then re-rank survivors), never one task per hot
    domain.  Oracle is the naive single window (results provably
    identical under a total order)."""
    from .textops.stats import cap_per_group

    out = cap_per_group(
        _docs(spark, sf_dir), "source",
        [F.desc("n_chars"), F.asc("doc_id")], k=SOURCE_CAP_K,
        id_col="doc_id",
    )
    return out.select("doc_id", "source",
                      F.col("n_chars").cast("long").alias("n_chars"),
                      F.col("rank").cast("long").alias("rank"))


SQL_SOURCE_CAP = f"""
WITH rk AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {SOURCE_CAP_K}
"""


# --- token-budget packing ----------------------------------------------------

PACK_BUDGET = 512


def q_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing (stats.pack_stream): every doc's (bin,
    offset) in the concatenated fixed-context training stream via a
    distributed exclusive prefix sum — the oracle is the naive
    single-window cumulative sum."""
    from .textops.stats import pack_stream

    docs = _docs(spark, sf_dir)
    t = F.col("text")
    with_tokens = docs.select(
        "doc_id",
        F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))
        .cast("long").alias("n_tokens"),
    )
    out = pack_stream(with_tokens, "n_tokens", "doc_id", budget=PACK_BUDGET)
    return out.select("doc_id", "n_tokens", "cum_excl", "bin", "bin_offset")


SQL_TOKEN_PACK = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens, cum_excl,
       CAST(cum_excl // {PACK_BUDGET} AS BIGINT) AS bin,
       CAST(cum_excl % {PACK_BUDGET} AS BIGINT) AS bin_offset
FROM c
"""


# --- unigram-LM quality proxy ---------------------------------------------------


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus's own MLE
    model (quality.unigram_logprob) — the model-free analog of the
    CCNet LM-perplexity quality filter.  One explode feeds both the
    model aggregation and the scoring join; no driver actions."""
    out = quality.unigram_logprob(_docs(spark, sf_dir), "text", "doc_id")
    return out.select(F.col("id").cast("long").alias("doc_id"),
                      "n_tokens", "mean_logprob")


SQL_UNIGRAM_LOGPROB = """
WITH raw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(regexp_replace(regexp_replace(text,
             '[^\\p{L}\\p{Nd}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +'),
             t -> t <> '')) AS tok
  FROM documents
),
model AS (SELECT tok, count(*) AS cf FROM raw GROUP BY tok),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM raw)
SELECT CAST(r.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln(m.cf / tot.t)), 4) AS mean_logprob
FROM raw r JOIN model m USING (tok) CROSS JOIN tot
GROUP BY r.doc_id
"""


# --- Stack-style code-file quality filters --------------------------------------

#: The synthetic corpus is single-line prose, so the gate derives a
#: multi-line "code file" per doc (8-token lines via the paragraph
#: chunking) and injects one pathological tail per doc_id%5 — each
#: triggering exactly one published drop rule (Kocetkov et al. 2022):
#: %5==0 autogenerated marker, %5==1 a 1200-char line (max_line_len),
#: %5==2 ~2k chars of punctuation in SHORT lines (alnum_frac only),
#: %5==3 a 999-char line (avg_line_len but not max), %5==4 clean (keep).


def _code_files(docs: DataFrame, tails: bool = True) -> DataFrame:
    from .analysis.analyzer import tokens_array_expr

    toks = tokens_array_expr(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(PARA_TOKENS)).cast("int")
    chunks = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * PARA_TOKENS + 1, PARA_TOKENS), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    body = F.array_join(chunks, "\n")
    if not tails:
        return docs.select("doc_id", body.alias("content"))
    d = F.col("doc_id") % 5
    content = (
        F.when(d == 0, F.concat(body, F.lit("\nDO NOT EDIT")))
        .when(d == 1, F.concat(body, F.lit("\n"), F.repeat(F.lit("x"), 1200)))
        .when(d == 2, F.concat(body, F.lit("\n"),
                               F.repeat(F.lit(";;;;;;;;; \n"), 180)))
        .when(d == 3, F.concat(body, F.lit("\n"), F.repeat(F.lit("y"), 999)))
        .otherwise(body)
    )
    return docs.select("doc_id", content.alias("content"))


def q_code_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stack-style code-file curation filters (quality.code_quality):
    per-line stats from transform/array_max/aggregate over ONE split —
    a pure map-side projection, no shuffle anywhere (the shape a 100-TB
    curation pass wants).  keep ANDs the four published rules."""
    out = quality.code_quality(_code_files(_docs(spark, sf_dir)),
                               "content", "doc_id")
    return out.select(F.col("id").cast("long").alias("id"),
                      "n_lines", "max_line_len", "avg_line_len",
                      "alnum_frac", "autogen", "keep")


SQL_CODE_QUALITY = """
WITH tokarr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(regexp_replace(regexp_replace(text,
             '[^\\p{L}\\p{Nd}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +'),
             t -> t <> '') AS toks
  FROM documents
),
chunks AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(toks) / 8.0) AS BIGINT)),
                        i -> array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 8), ' ')) AS cs
  FROM tokarr
),
bodies AS (SELECT doc_id, array_to_string(cs, chr(10)) AS body FROM chunks),
files AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN body || chr(10) || 'DO NOT EDIT'
           WHEN 1 THEN body || chr(10) || repeat('x', 1200)
           WHEN 2 THEN body || chr(10) || repeat(';;;;;;;;; ' || chr(10), 180)
           WHEN 3 THEN body || chr(10) || repeat('y', 999)
           ELSE body END AS content
  FROM bodies
),
stats AS (
  SELECT doc_id, content,
         string_split(content, chr(10)) AS ls
  FROM files
)
SELECT CAST(doc_id AS BIGINT) AS id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(coalesce(list_max(list_transform(ls, s -> len(s))), 0) AS BIGINT) AS max_line_len,
       round(list_sum(list_transform(ls, s -> len(s)))
             / greatest(len(ls), 1), 4) AS avg_line_len,
       round(len(regexp_replace(content, '[^A-Za-z0-9]', '', 'g'))
             / greatest(len(content), 1), 4) AS alnum_frac,
       (contains(content, 'DO NOT EDIT') OR contains(content, '@generated')
        OR contains(content, 'Autogenerated by')) AS autogen,
       (coalesce(list_max(list_transform(ls, s -> len(s))), 0) <= 1000
        AND round(list_sum(list_transform(ls, s -> len(s))) / greatest(len(ls), 1), 4) <= 100
        AND round(len(regexp_replace(content, '[^A-Za-z0-9]', '', 'g')) / greatest(len(content), 1), 4) >= 0.25
        AND NOT (contains(content, 'DO NOT EDIT') OR contains(content, '@generated')
                 OR contains(content, 'Autogenerated by'))) AS keep
FROM stats
"""


# --- paragraph-level exact dedup ----------------------------------------------

#: The synthetic corpus has no newlines, so the paragraph table is derived
#: by the GATE (not the operator): each doc's token array is chunked into
#: fixed 8-token paragraphs, and two boilerplate paragraphs are injected
#: at deterministic doc_id-derived sites so corpus-wide repeats exist —
#: the footer/header shape paragraph dedup is for.  Both sides construct
#: the identical table; the operator itself takes ANY (doc, idx, text)
#: paragraph table.
PARA_TOKENS = 8
PARA_BOILER_A = "subscribe to our newsletter for daily updates"
PARA_BOILER_B = "copyright example corp all rights reserved"


def _paragraphized(docs: DataFrame) -> DataFrame:
    from .analysis.analyzer import tokens_array_expr

    toks = tokens_array_expr(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(PARA_TOKENS)).cast("int")
    chunks = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * PARA_TOKENS + 1, PARA_TOKENS), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = F.col("doc_id")
    exploded = docs.select(
        "doc_id", F.posexplode(chunks).alias("para_idx", "_chunk"))
    para = (
        F.when((d % 5 == 0) & (F.col("para_idx") == 0), F.lit(PARA_BOILER_A))
        .when((d % 3 == 0) & (F.col("para_idx") == 1), F.lit(PARA_BOILER_B))
        .otherwise(F.col("_chunk"))
    )
    return exploded.select(
        "doc_id", F.col("para_idx").cast("long").alias("para_idx"),
        para.alias("para_text"))


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity exact dedup (dedup.paragraph_dedup_stats):
    per-doc count + ratio of paragraphs whose exact text already
    occurred earlier in the corpus — the boilerplate signal doc-level
    dedup cannot see.  Engine = one partial-aggregable shuffle on
    sha256(paragraph) + join-back; oracle = the naive per-paragraph
    window.  Identical answers under the same (doc, idx) total order."""
    out = dedup.paragraph_dedup_stats(_paragraphized(_docs(spark, sf_dir)))
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "n_paras", "n_dup_paras", "dup_ratio")


SQL_PARAGRAPH_DEDUP = f"""
WITH {TOKARR_CTE},
chunks AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(toks) / {PARA_TOKENS}.0) AS BIGINT)),
                        i -> array_to_string(list_slice(toks, i * {PARA_TOKENS} + 1,
                                                        i * {PARA_TOKENS} + {PARA_TOKENS}), ' ')) AS cs
  FROM tokarr
),
paras0 AS (
  SELECT doc_id, pos AS para_idx, para
  FROM (SELECT doc_id,
               unnest(list_transform(range(len(cs)),
                      i -> {{'pos': i, 'para': cs[i + 1]}}), recursive := true)
        FROM chunks)
),
paras AS (
  SELECT doc_id, para_idx,
         CASE WHEN doc_id % 5 = 0 AND para_idx = 0 THEN '{PARA_BOILER_A}'
              WHEN doc_id % 3 = 0 AND para_idx = 1 THEN '{PARA_BOILER_B}'
              ELSE para END AS para_text
  FROM paras0
),
marked AS (
  SELECT doc_id, para_idx,
         row_number() OVER (PARTITION BY para_text
                            ORDER BY doc_id, para_idx) > 1 AS is_dup
  FROM paras
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
       round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_ratio
FROM marked GROUP BY doc_id
"""


TEXTOPS_QUERIES = {
    "pii_redact": q_pii_redact,
    "source_cap": q_source_cap,
    "token_pack": q_token_pack,
    "paragraph_dedup": q_paragraph_dedup,
    "code_quality": q_code_quality,
    "unigram_logprob": q_unigram_logprob,
    "tfidf_keywords": q_tfidf_keywords,
    "repetition_ratio": q_repetition_ratio,
    "quality_sampled": q_quality_sampled,
    "blob_metadata": q_blob_metadata,
    "image_headers": q_image_headers,
    "frame_samples": q_frame_samples,
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_signatures": q_minhash_signatures,
    "minhash_lsh_dedup": q_minhash_lsh_dedup,
    "dedup_components": q_dedup_components,
    "near_dedup_keep": q_near_dedup_keep,
    "bigram_pmi": q_bigram_pmi,
    "simhash": q_simhash,
    "simhash_near_dup": q_simhash_near_dup,
    "cosine_topk": q_cosine_topk,
    "lsh_topk": q_lsh_topk,
    "lsh_multiprobe_topk": q_lsh_multiprobe_topk,
    "ivf_topk": q_ivf_topk,
    "ivf_trained_topk": q_ivf_trained_topk,
    "training_mix": q_training_mix,
    "decontaminate": q_decontaminate,
    "mix_report": q_mix_report,
    "embedding_near_dup": q_embedding_near_dup,
    "language_id": q_language_id,
    "token_counts": q_token_counts,
    "quality_score": q_quality_score,
    "doc_fingerprint": q_fingerprint,
    "value_quantiles": q_value_quantiles,
    "kmv_distinct": q_kmv_distinct,
    "corpus_split": q_corpus_split,
}

TEXTOPS_ORACLES = {
    "pii_redact": _sql_pii_redact(),
    "source_cap": SQL_SOURCE_CAP,
    "token_pack": SQL_TOKEN_PACK,
    "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
    "code_quality": SQL_CODE_QUALITY,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "tfidf_keywords": _sql_tfidf_keywords(),
    "repetition_ratio": SQL_REPETITION_RATIO,
    "quality_sampled": _sql_quality_sampled(),
    "blob_metadata": SQL_BLOB_METADATA,
    "image_headers": SQL_IMAGE_HEADERS,
    "frame_samples": SQL_FRAME_SAMPLES,
    "dedup_exact": SQL_DEDUP_EXACT,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "minhash_signatures": _sql_minhash(),
    "minhash_lsh_dedup": _sql_minhash_lsh_dedup(),
    "dedup_components": _sql_dedup_components(),
    "near_dedup_keep": _sql_near_dedup_keep(),
    "bigram_pmi": _sql_bigram_pmi(),
    "simhash": _sql_simhash(),
    "simhash_near_dup": _sql_simhash_near_dup(),
    "cosine_topk": SQL_COSINE_TOPK,
    "lsh_topk": _sql_lsh_topk(),
    "lsh_multiprobe_topk": _sql_lsh_multiprobe_topk(),
    "ivf_topk": _sql_ivf_topk(),
    "ivf_trained_topk": _sql_ivf_trained_topk(),
    "training_mix": _sql_training_mix(),
    "decontaminate": SQL_DECONTAMINATE,
    "mix_report": SQL_MIX_REPORT,
    "embedding_near_dup": _sql_emb_near_dup(),
    "language_id": _sql_language_id(),
    "token_counts": SQL_TOKEN_COUNTS,
    "quality_score": _sql_quality_score(),
    "doc_fingerprint": SQL_FINGERPRINT,
    "value_quantiles": SQL_VALUE_QUANTILES,
    "kmv_distinct": _sql_kmv_distinct(),
    "corpus_split": _sql_corpus_split(),
}
