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
    field, tokens tagged with their field's weight COLUMN, one union,
    ONE partial+final aggregation on (id, term) — a single exchange
    (per-field pre-aggregation would add one shuffle per field and only
    pays off when fields are highly repetitive)."""
    parts = [
        corpus.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_array_expr(F.coalesce(F.col(col), F.lit("")))).alias("term"),
            F.lit(w).cast("long").alias("w"),
        )
        for col, w in field_weights_tenths.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("id", "term").agg(F.sum("w").cast("long").alias("tfw"))


def fielded_dl(corpus: DataFrame, id_col: str,
               field_weights_tenths: dict[str, int]) -> DataFrame:
    """-> (id, dlw): weighted doc length in integer tenths (pre-filter
    token counts, same convention as the unfielded build)."""
    expr = None
    for col, w in field_weights_tenths.items():
        piece = F.size(tokens_array_expr(F.coalesce(F.col(col), F.lit("")))) * F.lit(w)
        expr = piece if expr is None else expr + piece
    return corpus.select(F.col(id_col).alias("id"), expr.cast("long").alias("dlw"))


def _bm25f_score_tail(
    tf: DataFrame,
    dl: DataFrame,
    dft: DataFrame,
    query_terms: DataFrame,
    n_docs: int,
    avgdl_t: int,
    k: int,
    cfg: EngineConfig,
) -> DataFrame:
    """Shared scoring tail: (id, term, tfw) ⋈ query terms ⋈ df ⋈ dl ->
    top-k (id, score).  ``dft`` carries (term, df double)."""
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
    scalar-stats pattern as build_index.  For a build-once/query-many
    serving path use :func:`write_fielded_index` +
    :func:`bm25f_search_served` instead (the reference builds its index
    once and queries it many times, Indexer.java:597-686)."""
    weights = field_weights_tenths or DEFAULT_FIELD_WEIGHTS_TENTHS
    tf = fielded_tf(corpus, id_col, weights)
    dl = fielded_dl(corpus, id_col, weights)
    r = dl.agg(F.count("*").alias("n"), F.sum("dlw").alias("s")).collect()[0]
    n_docs = int(r["n"])
    avgdl_t = (int(r["s"] or 0) // n_docs) if n_docs else 0
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    return _bm25f_score_tail(tf, dl, dft, query_terms, n_docs, avgdl_t, k, cfg)


# --- persisted fielded layout (build once, query many) ----------------------


def build_fielded_tables(
    corpus: DataFrame,
    id_col: str = "id",
    field_weights_tenths: dict[str, int] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """-> (postings, docs, terms, stats) for the fielded layout:
    postings(id, term, tfw) with tfw in integer tenths, docs(id, dlw),
    terms(term, df), stats{n_docs, avgdl_tenths, field_weights_tenths}.
    One corpus pass (fielded_tf) + the dl projection + a two-scalar
    stats job — the fielded twin of build_index."""
    weights = field_weights_tenths or DEFAULT_FIELD_WEIGHTS_TENTHS
    tf = fielded_tf(corpus, id_col, weights)
    dl = fielded_dl(corpus, id_col, weights)
    r = dl.agg(F.count("*").alias("n"), F.sum("dlw").alias("s")).collect()[0]
    n_docs = int(r["n"])
    avgdl_t = (int(r["s"] or 0) // n_docs) if n_docs else 0
    terms = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    stats = {
        "n_docs": n_docs,
        "avgdl_tenths": avgdl_t,
        "field_weights_tenths": dict(weights),
    }
    return tf, dl, terms, stats


def write_fielded_index(
    corpus: DataFrame,
    out_dir: str,
    id_col: str = "id",
    field_weights_tenths: dict[str, int] | None = None,
    term_buckets: int = 8,
) -> dict:
    """Persist the fielded layout: ``postings/`` partitioned by
    ``bucket = hash(term) % term_buckets`` (partition-pruned at query
    time, same layout contract as builder.write_index), sorted within
    partitions by (term, id); ``docs/``; ``terms/``; ``stats.json``.
    Returns the stats manifest."""
    import json
    import os

    from ..index.builder import term_bucket_expr

    tf, dl, terms, stats = build_fielded_tables(corpus, id_col, field_weights_tenths)
    stats["term_buckets"] = term_buckets
    os.makedirs(out_dir, exist_ok=True)
    (
        tf.withColumn("bucket", term_bucket_expr(F.col("term"), term_buckets))
        .repartition(term_buckets, "bucket")
        .sortWithinPartitions("term", "id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, "postings"))
    )
    dl.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
    terms.write.mode("overwrite").parquet(os.path.join(out_dir, "terms"))
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    return stats


def read_fielded_index(spark, out_dir: str):
    """-> (postings, docs, terms, stats) from a write_fielded_index
    layout (postings keeps the ``bucket`` partition column for
    pruning)."""
    import json
    import os

    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    terms = spark.read.parquet(os.path.join(out_dir, "terms"))
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    return postings, docs, terms, stats


def bm25f_search_served(
    spark,
    postings: DataFrame,
    docs: DataFrame,
    terms: DataFrame,
    stats: dict,
    query_terms: list[str],
    k: int = 10,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """BM25F over the PERSISTED fielded layout — no re-tokenization:
    the query's term buckets are computed in one tiny job and pushed as
    a partition filter on ``postings/bucket=…`` (the scan reads only
    those directories), then the shared scoring tail runs on the
    pre-built (id, term, tfw) rows.  Value-identical to bm25f_search
    on the same corpus (the round-trip must be value-invisible)."""
    from ..index.builder import term_bucket_expr

    n_buckets = int(stats["term_buckets"])
    qdf = spark.createDataFrame([(t,) for t in query_terms], "term string")
    buckets = [
        r["b"]
        for r in qdf.select(
            term_bucket_expr(F.col("term"), n_buckets).alias("b")
        ).distinct().collect()
    ]
    pruned = postings.filter(F.col("bucket").isin(buckets)).drop("bucket")
    dft = terms.select("term", F.col("df").cast("double").alias("df"))
    return _bm25f_score_tail(
        pruned, docs, dft, qdf,
        int(stats["n_docs"]), int(stats["avgdl_tenths"]), k, cfg,
    )
