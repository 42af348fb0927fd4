"""Quantized impact layout: per-posting BM25 partial scores precomputed
at BUILD time and quantized to ``bits``-bit integers against the global
maximum — the impact-ordered-index idea (Anh & Moffat, "Pruned query
evaluation using pre-computed impacts", SIGIR 2006; Lucene's
impact-sorted skip data is the production descendant).

Why a 100-TB engine wants this layout:

- **Bytes.** A posting's contribution collapses from (tf int64 + the
  df/dl/stats join needed to score it) to ONE small int — the serving
  scan reads ~1/8 the data and skips two joins entirely.  This composes
  with the round-6 term_id dictionary encoding (builder.assign_dense_ids):
  the served posting row is (term_id int64, doc_id int64, impact int16).
- **Early termination.** Integer impacts bound each term's remaining
  contribution, enabling the same block-max pruning WAND uses, without
  touching doc lengths at query time.

Scoring uses the NON-NEGATIVE BM25 idf variant
``idf = log2(1 + (N - df + 0.5)/(df + 0.5))`` (Lucene's formula):
quantization against a global max needs a non-negative bounded score,
and the classic reference idf (OkapiBM25_FR.java:160) goes negative for
df > N/2 — on this corpus's deliberately tiny vocabulary that is MOST
terms, which would clamp every impact to zero.  The exact-score paths
(query/scoring.py) keep the reference formula; the impact layout is an
explicitly different, documented serving trade-off, graded by its own
oracle implementing the same variant.

Quantization: ``impact = min(2^bits - 1, floor(score / max_score *
2^bits))`` where max_score is the global maximum partial score — one
driver scalar computed once per build (same pattern as index stats).
Query-time score = SUM of integer impacts: pure int64 arithmetic, no
floats anywhere in the serving plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..query.scoring import log2c
from .builder import IndexTables


def _impact_score(tf, df, dl, n_docs: int, avgdl: float, k1: float, b: float):
    """Non-negative per-posting BM25 partial (Lucene idf variant)."""
    idf = log2c(F.lit(1.0) + (F.lit(float(n_docs)) - df + F.lit(0.5)) / (df + F.lit(0.5)))
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(float(avgdl)))
    return idf * tf * F.lit(k1 + 1.0) / denom


def quantized_impacts(
    index: IndexTables,
    cfg: EngineConfig = DEFAULT_CONFIG,
    bits: int = 8,
) -> tuple[DataFrame, float]:
    """-> ((term, doc_id, impact long), max_score).

    One pass over postings (join df + dl, both already index tables),
    one global-max driver scalar, one quantize expression.  The result
    is the serving layout; max_score is persisted alongside it (meta
    sink) so later delta merges quantize against the SAME scale.
    """
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    n, avgdl = index.stats["n_docs"], index.stats["avgdl"]
    m = (
        index.postings.select("term", "doc_id", "tf")
        .join(index.docs.select("doc_id", "length"), "doc_id", "inner")
        .join(F.broadcast(index.terms.select("term", "df")), "term", "inner")
    )
    scored = m.withColumn(
        "_ts",
        _impact_score(F.col("tf").cast("double"), F.col("df").cast("double"),
                      F.col("length").cast("double"), n, float(avgdl),
                      cfg.k1, cfg.b),
    )
    max_s = scored.agg(F.max("_ts")).collect()[0][0]
    if max_s is None or max_s <= 0.0:
        raise ValueError("empty index or non-positive max impact score")
    scale = float(2 ** bits)
    impacts = scored.select(
        "term",
        "doc_id",
        F.least(F.lit(int(scale) - 1),
                F.floor(F.col("_ts") / F.lit(float(max_s)) * F.lit(scale)))
        .cast("long")
        .alias("impact"),
    )
    return impacts, float(max_s)


def impact_topk(
    impacts: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
) -> DataFrame:
    """-> (doc_id, impact_score long): integer-sum top-k over the
    quantized layout.  The whole serving plan is int64 arithmetic —
    broadcast the (tiny) query-term set, sum impacts per doc,
    TakeOrderedAndProject the top k."""
    return (
        impacts.join(F.broadcast(query_terms.select("term").distinct()),
                     "term", "inner")
        .groupBy("doc_id")
        .agg(F.sum("impact").cast("long").alias("impact_score"))
        .orderBy(F.desc("impact_score"), F.asc("doc_id"))
        .limit(k)
    )
