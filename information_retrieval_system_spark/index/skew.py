"""Hot-term skew handling + skew observability.

At 10^12 files a term like ``the``/``license``/``import`` appears in a
large fraction of all documents.  Aggregations whose reduce key is the
bare term and whose per-key state grows with df (e.g. building a term's
full posting array) would funnel that term through one reducer — the
same bottleneck the reference hides inside its single-threaded merge
cascade (SURVEY.md §4 item 3).  Counter-style aggs (df/cf) are safe
(Catalyst's partial aggregation bounds reducer input by #map-partitions),
and the block layout keys by (term, block_id) which is bounded by
construction; this module covers the remaining cases and exposes the
stats that tell you when to care.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, EngineConfig


def skew_stats(postings: DataFrame, n_docs: int, top: int = 10) -> dict:
    """Top terms by df + the skew ratios a build should log.

    Returned dict goes into the build manifest (checkpoint.py) so lineage
    records WHICH terms were hot at build time."""
    rows = (
        postings.groupBy("term").agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(top)
        .collect()
    )
    out = {
        "hot_terms": [{"term": r.term, "df": int(r.df),
                       "df_ratio": round(int(r.df) / n_docs, 4) if n_docs else 0.0}
                      for r in rows],
    }
    if rows:
        out["max_df_ratio"] = out["hot_terms"][0]["df_ratio"]
    return out


def salted_posting_arrays(
    postings: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """term -> full sorted posting array, WITHOUT a per-term hot reducer.

    The naive ``groupBy(term).agg(collect_list(...))`` gives one reducer
    the whole posting list of every hot term.  Two-level salted plan:

    1. groupBy(term, salt = hash(doc) % S): each reducer holds at most
       ~df/S postings of a hot term, collected into a locally-sorted
       partial array;
    2. groupBy(term): merge S partial arrays (S small) and flatten.

    Output: (term, df, postings array<struct<doc_int,tf>> sorted by
    doc_int) — the row shape a vocabulary/posting export (S5/S6) writes.
    """
    s = cfg.salt_buckets
    partial = (
        postings.withColumn("_salt", F.pmod(F.xxhash64("doc_int"), F.lit(s)))
        .groupBy("term", "_salt")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("doc_int"), F.col("tf")))
            ).alias("part"),
            F.count("*").alias("c"),
        )
    )
    return (
        partial.groupBy("term")
        .agg(
            F.sort_array(F.flatten(F.collect_list("part"))).alias("postings"),
            F.sum("c").cast("long").alias("df"),
        )
        .select("term", "df", "postings")
    )
