"""Field-weighted BM25 (BM25F, simple weighted-tf variant with shared
length normalization).

The reference weights the TITLE field at 2.3 when expanding queries
(Search_FR.java:281-623 ``DWeight``/title handling) but scores one
concatenated body; BM25F makes the field weighting part of the SCORING
model instead:

- ``tf̃(t,d)  = Σ_f w_f · tf_f(t,d)``
- ``dl̃(d)   = Σ_f w_f · dl_f(d)``  (same weights — shared normalization)
- ``avgdl̃   = floor(Σ_d dl̃(d) / N)`` in weight units
- score = BM25(tf̃, dl̃, avgdl̃) with ``idf = log2((N-df+0.5)/(df+0.5))``
  and ``df(t) = |{d : tf̃(t,d) > 0}|``.

Cross-engine exactness: weights are INTEGER TENTHS (title 2.3 → 23),
so tf̃/dl̃/avgdl̃ are integer arithmetic end-to-end and the doubles fed
to the scoring expression are bit-identical in Spark and DuckDB (no
order-dependent double summation anywhere).

Scale shape: one tokenize pass per field, one union + partial+final
aggregation for the weighted tf, broadcast term-stats join, hash agg,
TakeOrderedAndProject — the same two-shuffle plan as bm25_search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..analysis.analyzer import tokens_array_expr
from ..config import DEFAULT_CONFIG, EngineConfig
from .scoring import log2c

#: reference-anchored default: title 2.3, body/abstract 1.0 (in tenths)
DEFAULT_FIELD_WEIGHTS_TENTHS = {"title": 23, "abstract": 10}


def fielded_tf(corpus: DataFrame, id_col: str,
               field_weights_tenths: dict[str, int]) -> DataFrame:
    """corpus(id, <field columns>) -> (id, term, tfw) with
    ``tfw = Σ_f w_f·tf_f`` in integer tenths.  One tokenize pass per
    field, one union, ONE partial+final aggregation."""
    parts = []
    for col, w in field_weights_tenths.items():
        toks = corpus.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_array_expr(F.coalesce(F.col(col), F.lit("")))).alias("term"),
        )
        parts.append(toks.groupBy("id", "term").agg(
            (F.count("*") * F.lit(w)).cast("long").alias("tfw")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("id", "term").agg(F.sum("tfw").cast("long").alias("tfw"))


def fielded_dl(corpus: DataFrame, id_col: str,
               field_weights_tenths: dict[str, int]) -> DataFrame:
    """-> (id, dlw): weighted doc length in integer tenths (pre-filter
    token counts, same convention as the unfielded build)."""
    expr = None
    for col, w in field_weights_tenths.items():
        piece = F.size(tokens_array_expr(F.coalesce(F.col(col), F.lit("")))) * F.lit(w)
        expr = piece if expr is None else expr + piece
    return corpus.select(F.col(id_col).alias("id"), expr.cast("long").alias("dlw"))


def bm25f_search(
    corpus: DataFrame,
    query_terms: DataFrame,
    id_col: str = "id",
    field_weights_tenths: dict[str, int] | None = None,
    k: int = 10,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """-> (id, score) top-k under (score DESC, id ASC).

    ``query_terms`` needs a ``term`` column (duplicates count once, the
    BM25 convention).  All stats are computed in-plan; the only driver
    values are N and avgdl (two scalars, one tiny job) — the same
    scalar-stats pattern as build_index."""
    weights = field_weights_tenths or DEFAULT_FIELD_WEIGHTS_TENTHS
    tf = fielded_tf(corpus, id_col, weights)
    dl = fielded_dl(corpus, id_col, weights)
    r = dl.agg(F.count("*").alias("n"), F.sum("dlw").alias("s")).collect()[0]
    n_docs = int(r["n"])
    avgdl_t = (int(r["s"] or 0) // n_docs) if n_docs else 0

    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    qt = query_terms.select("term").distinct()
    m = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "id")
    )
    idf = log2c((F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    tfw = F.col("tfw") / F.lit(10.0)
    dlw = F.col("dlw") / F.lit(10.0)
    avgdlw = F.lit(avgdl_t / 10.0)
    ts = idf * tfw * F.lit(cfg.k1 + 1.0) / (
        tfw + F.lit(cfg.k1) * (F.lit(1.0 - cfg.b) + F.lit(cfg.b) * dlw / avgdlw)
    )
    return (
        m.withColumn("ts", ts)
        .groupBy("id")
        .agg(F.sum("ts").alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )
