"""Gradeable graph queries: PageRank + B6 score fusion.

Edges are derived DETERMINISTICALLY from the documents table (no external
data): src = doc_id, dst = (doc_id*7 + 13*j) % N for j in 1..3, self-loops
excluded — identical expressions on the Spark and DuckDB sides.  PageRank
runs a FIXED 12 undamped power iterations on both sides (the engine's
convergence loop with threshold=0 runs exactly max_iters), zero-in-degree
nodes keep their previous rank (reference semantics, Indexer.java
:1064-1073).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import EngineConfig
from .graph.pagerank import attach_pagerank, pagerank
from .query import scoring
from . import entry_queries as EQ

PR_ITERS = 12
FUSION_K = 20


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    e = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(*[(F.col("doc_id") * 7 + 13 * j) % n for j in (1, 2, 3)])
        ).alias("dst"),
    )
    return e.filter(F.col("src") != F.col("dst"))


EDGES_CTE = """
n AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT src, dst FROM (
    SELECT doc_id AS src, unnest([(doc_id*7+13) % n.n, (doc_id*7+26) % n.n, (doc_id*7+39) % n.n]) AS dst
    FROM documents CROSS JOIN n)
  WHERE src <> dst
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)
"""


def _pr_cfg() -> EngineConfig:
    return EngineConfig(pagerank_threshold=0.0, pagerank_max_iters=PR_ITERS)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ranks = pagerank(docs.select("doc_id"), _edges(spark, sf_dir), _pr_cfg())
    return ranks.select(F.col("doc_id").cast("long").alias("doc_id"),
                        F.round("pagerank", 6).alias("pr"))


SQL_PAGERANK = f"""
WITH RECURSIVE
{EDGES_CTE},
pr(iter, id, rank) AS (
  SELECT 0, doc_id, 1.0 / (SELECT n FROM n) FROM documents
  UNION ALL
  SELECT p.iter + 1, p.id,
         coalesce((SELECT sum(p2.rank / d.outdeg)
                   FROM pr p2
                   JOIN edges e ON e.src = p2.id AND p2.iter = p.iter
                   JOIN deg d ON d.src = p2.id
                   WHERE e.dst = p.id), p.rank)
  FROM pr p WHERE p.iter < {PR_ITERS}
)
SELECT CAST(id AS BIGINT) AS doc_id, round(rank, 6) AS pr
FROM pr WHERE iter = {PR_ITERS}
"""


def q_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: BM25 (stop/stem off for SQL parity) fused with pagerank."""
    ix = EQ.get_index(spark, sf_dir)
    ranks = pagerank(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
        _edges(spark, sf_dir), _pr_cfg(),
    )
    docs_pr = attach_pagerank(ix.docs, ranks)
    bm25 = scoring.bm25_search(ix, EQ.query_terms_df(spark), k=FUSION_K,
                               cfg=EQ.NOSTEM_CFG)
    fused = scoring.fuse_with_pagerank(bm25, docs_pr, EngineConfig())
    return fused.select(F.col("doc_id").cast("long").alias("doc_id"),
                        F.round("score", 6).alias("score")).limit(FUSION_K)


SQL_FUSION_TOPK = f"""
WITH RECURSIVE
{EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS nd,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
q AS (SELECT unnest({EQ._sql_terms_list()}) AS term),
scored AS (
  SELECT p.doc_id,
         (ln((s.nd - f.df + 0.5) / (f.df + 0.5)) / ln(2))
           * p.tf * ({EQ.K1} + 1)
           / (p.tf + {EQ.K1} * (1 - {EQ.B} + {EQ.B} * d.dl / s.avgdl)) AS ts
  FROM post p JOIN q USING (term) JOIN dft f USING (term)
  JOIN dl d USING (doc_id) CROSS JOIN stats s
),
bm25 AS (
  SELECT doc_id, sum(ts) AS score FROM scored GROUP BY doc_id
  ORDER BY sum(ts) DESC, doc_id ASC LIMIT {FUSION_K}
),
{EDGES_CTE.strip().rstrip()},
pr(iter, id, rank) AS (
  SELECT 0, doc_id, 1.0 / (SELECT n FROM n) FROM documents
  UNION ALL
  SELECT p.iter + 1, p.id,
         coalesce((SELECT sum(p2.rank / d.outdeg)
                   FROM pr p2
                   JOIN edges e ON e.src = p2.id AND p2.iter = p.iter
                   JOIN deg d ON d.src = p2.id
                   WHERE e.dst = p.id), p.rank)
  FROM pr p WHERE p.iter < {PR_ITERS}
),
prf AS (SELECT id AS doc_id, rank AS pagerank FROM pr WHERE iter = {PR_ITERS}),
consts AS (
  SELECT (SELECT avg(pagerank) FROM prf) AS avg_pr,
         (SELECT avg(score) FROM bm25) AS avg_s
),
z AS (SELECT CASE WHEN sqrt(avg_pr*avg_pr + avg_s*avg_s) = 0 THEN 1.0
                  ELSE sqrt(avg_pr*avg_pr + avg_s*avg_s) END AS z FROM consts)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       round(0.7 * b.score / z.z + 0.3 * coalesce(p.pagerank, 0) / z.z, 6) AS score
FROM bm25 b LEFT JOIN prf p USING (doc_id) CROSS JOIN z
ORDER BY (0.7 * b.score / z.z + 0.3 * coalesce(p.pagerank, 0) / z.z) DESC, b.doc_id ASC
LIMIT {FUSION_K}
"""

def q_batch_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 fusion over the WHOLE batch query set in ONE plan: per-qid
    BM25 top-k, then batch_fuse_with_pagerank computes each query's
    normalizer Z_q inside the plan (per-qid agg + broadcast 1-row
    avg-pagerank) — the Run_B6 shape (635 queries in the reference,
    Search_FR.java:994-1098) without per-query driver scalars."""
    from .entry_batch import BATCH_K, _batch_terms_df
    from .query.batch import batch_bm25_search

    ix = EQ.get_index(spark, sf_dir)
    ranks = pagerank(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
        _edges(spark, sf_dir), _pr_cfg(),
    )
    docs_pr = attach_pagerank(ix.docs, ranks)
    res = batch_bm25_search(ix, _batch_terms_df(spark), k=BATCH_K, cfg=EQ.NOSTEM_CFG)
    fused = scoring.batch_fuse_with_pagerank(
        res.select("qid", "doc_id", "score"), docs_pr, EngineConfig()
    )
    return fused.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("score", 6).alias("score"),
    )


def _sql_batch_fusion(q_block: str | None = None) -> str:
    # built on the UNROUNDED shared batch-results CTE (SQL_BATCH_BM25
    # rounds scores to 4 decimals for its own gate; fusion consumes raw)
    from .entry_batch import sql_batch_results_cte

    return f"""
WITH RECURSIVE
{sql_batch_results_cte(q_block)},
{EDGES_CTE.strip().rstrip()},
pr(iter, id, rank) AS (
  SELECT 0, doc_id, 1.0 / (SELECT n FROM n) FROM documents
  UNION ALL
  SELECT p.iter + 1, p.id,
         coalesce((SELECT sum(p2.rank / d.outdeg)
                   FROM pr p2
                   JOIN edges e ON e.src = p2.id AND p2.iter = p.iter
                   JOIN deg d ON d.src = p2.id
                   WHERE e.dst = p.id), p.rank)
  FROM pr p WHERE p.iter < {PR_ITERS}
),
prf AS (SELECT id AS doc_id, rank AS pagerank FROM pr WHERE iter = {PR_ITERS}),
avgpr AS (SELECT avg(pagerank) AS avg_pr FROM prf),
perq AS (SELECT qid, avg(score) AS avg_s FROM results GROUP BY qid),
z AS (
  SELECT p.qid,
         CASE WHEN sqrt(a.avg_pr*a.avg_pr + p.avg_s*p.avg_s) = 0 THEN 1.0
              ELSE sqrt(a.avg_pr*a.avg_pr + p.avg_s*p.avg_s) END AS z
  FROM perq p CROSS JOIN avgpr a
)
SELECT CAST(r.qid AS BIGINT) AS qid, CAST(r.doc_id AS BIGINT) AS doc_id,
       round(0.7 * r.score / z.z + 0.3 * coalesce(p.pagerank, 0) / z.z, 6) AS score
FROM results r LEFT JOIN prf p USING (doc_id) JOIN z USING (qid)
"""


#: splits the 5-query batch into mixed routes at sf0.01 (zzznotfound's
#: Σdf = 0 goes exhaustive; the multi-term queries clear this and go
#: WAND) — tests/test_wand.py asserts the mix; the ORACLE is the same
#: unrouted SQL because both routes are exact (value-invisible routing)
ROUTED_MIN_POSTINGS = 400


def q_routed_batch_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Run_B6 shape end-to-end in <= 3 plans (VERDICT r3 #4):
    one driver collect routes every query on its Σdf, the WAND subset
    scores through ONE batched block-max cogroup, the rest through ONE
    exhaustive batch join, and batch_fuse_with_pagerank fuses the union
    with per-qid Z in-plan (Search_FR.java:1265-1319 runs the same 635
    queries one at a time)."""
    from .entry_batch import BATCH_K, _batch_terms_df, get_blocks
    from .query.wand import route_batch_bm25

    ix = EQ.get_index(spark, sf_dir)
    blocks, dlb = get_blocks(spark, sf_dir)
    res, routes = route_batch_bm25(
        ix, blocks, dlb, _batch_terms_df(spark), k=BATCH_K, cfg=EQ.NOSTEM_CFG,
        block_span=256, wand_min_postings=ROUTED_MIN_POSTINGS,
    )
    ranks = pagerank(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
        _edges(spark, sf_dir), _pr_cfg(),
    )
    docs_pr = attach_pagerank(ix.docs, ranks)
    fused = scoring.batch_fuse_with_pagerank(
        res.select("qid", "doc_id", "score"), docs_pr, EngineConfig()
    )
    return fused.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("score", 6).alias("score"),
    )


#: splits the CORRECTED batch into mixed routes at sf0.01 (corrected
#: Σdf: qid1=1172, qid2=1160, qid3=787, qid5=1548; qid4 uncorrectable,
#: drops out) — qid3 goes exhaustive, qids 1/2/5 go WAND; the oracle is
#: route-free because both paths are exact
CRF_MIN_POSTINGS = 1000


def q_corrected_routed_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL degraded-query lifecycle in-plan (VERDICT r4 #5): a
    typo'd multi-query set -> SymSpell correction against the index
    vocabulary (per-qid suggestion sets as a DataFrame — no driver
    round-trip), the uncorrectable qid drops out -> cost-based batch
    routing (ONE collect splits qids into <=2 exact scoring plans) ->
    per-qid pagerank fusion with in-plan normalizers — the reference's
    interactive loop (Search_FR.java:1265-1319) composed end-to-end."""
    from .entry_batch import BATCH_K, TYPO_BATCH, get_blocks
    from .query.spelling import correct_terms
    from .query.wand import route_batch_bm25

    ix = EQ.get_index(spark, sf_dir)
    blocks, dlb = get_blocks(spark, sf_dir)
    q = spark.createDataFrame(
        [(qid, t) for qid, terms in TYPO_BATCH for t in terms],
        "qid long, qterm string",
    )
    corrected = correct_terms(ix.terms.select("term", "df"), q, max_distance=1)
    qt = (
        corrected.filter(F.col("suggestion").isNotNull())
        .select("qid", F.col("suggestion").alias("term"))
        .distinct()
        .withColumn("qtf", F.lit(1.0))
    )
    res, routes = route_batch_bm25(
        ix, blocks, dlb, qt, k=BATCH_K, cfg=EQ.NOSTEM_CFG,
        block_span=256, wand_min_postings=CRF_MIN_POSTINGS,
    )
    ranks = pagerank(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
        _edges(spark, sf_dir), _pr_cfg(),
    )
    docs_pr = attach_pagerank(ix.docs, ranks)
    fused = scoring.batch_fuse_with_pagerank(
        res.select("qid", "doc_id", "score"), docs_pr, EngineConfig()
    )
    return fused.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("score", 6).alias("score"),
    )


def _sql_corrected_routed_fusion() -> str:
    from .entry_batch import sql_corrected_q_block

    return _sql_batch_fusion(sql_corrected_q_block())


GRAPH_QUERIES = {
    "corrected_routed_fusion": q_corrected_routed_fusion,
    "routed_batch_fusion": q_routed_batch_fusion,
    "pagerank": q_pagerank,
    "fusion_topk": q_fusion_topk,
    "batch_fusion": q_batch_fusion,
}

GRAPH_ORACLES = {
    "corrected_routed_fusion": _sql_corrected_routed_fusion(),
    "routed_batch_fusion": _sql_batch_fusion(),
    "pagerank": SQL_PAGERANK,
    "fusion_topk": SQL_FUSION_TOPK,
    "batch_fusion": _sql_batch_fusion(),
}
