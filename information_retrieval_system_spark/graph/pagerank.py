"""PageRank as an iterative DataFrame join-aggregate.

Reference semantics (Indexer.java:998-1104, SURVEY.md §2.7 R8):
- nodes = all indexed docs; edges = citation/repo links whose BOTH
  endpoints exist (dangling targets dropped, Indexer.java:1030-1036);
- init PR = 1/|V| (Indexer.java:1018);
- iterate: next(v) = sum over u->v of PR(u)/outdeg(u) — UNDAMPED, no
  dangling-mass redistribution (plain power iteration);
- nodes with zero in-degree KEEP their previous rank (the reference
  copies next->cur only when next != 0, Indexer.java:1064-1073);
- stop when max|Δ| < threshold (1.3e-5, themis.config:21).

Scale shape: one shuffle per iteration (edges ⋈ ranks on src, groupBy
dst); ranks are localCheckpoint'd every ``checkpoint_every`` iterations to
cut lineage — at cluster scale this would be a reliable checkpoint to
object storage (SURVEY.md §3 E3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, EngineConfig


def resolve_edges(edges: DataFrame, nodes: DataFrame,
                  src: str = "src", dst: str = "dst") -> DataFrame:
    """J6: drop edges whose src or dst is not an indexed node."""
    n = nodes.select(F.col(nodes.columns[0]).alias("_n"))
    return (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .join(n.withColumnRenamed("_n", "src"), "src", "leftsemi")
        .join(n.withColumnRenamed("_n", "dst"), "dst", "leftsemi")
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id_col, pagerank double).

    ``nodes``: one row per vertex.  ``edges``: (src, dst) already
    resolved (use :func:`resolve_edges` first for J6 semantics).
    """
    spark = nodes.sparkSession
    n = nodes.count()
    if n == 0:
        return nodes.select(F.col(id_col), F.lit(0.0).alias("pagerank")).limit(0)

    verts = nodes.select(F.col(id_col).alias("id")).distinct()
    # out-degree once; reused every iteration (broadcast when small)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_deg = edges.join(outdeg, "src").select("src", "dst", "outdeg").cache()
    edges_deg.count()

    ranks = verts.withColumn("rank", F.lit(1.0 / n)).cache()

    for it in range(cfg.pagerank_max_iters):
        contrib = (
            edges_deg.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("next_rank"))
        )
        new_ranks = (
            ranks.join(contrib, "id", "left")
            # zero-in-degree nodes keep their previous rank (see module doc)
            .select(
                "id",
                F.coalesce(F.col("next_rank"), F.col("rank")).alias("rank"),
                F.abs(F.coalesce(F.col("next_rank"), F.col("rank")) - F.col("rank")).alias("_d"),
            )
        )
        if (it + 1) % cfg.pagerank_checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.cache()
        delta = new_ranks.agg(F.max("_d")).collect()[0][0] or 0.0
        ranks.unpersist()
        ranks = new_ranks.select("id", "rank")
        if delta < cfg.pagerank_threshold:
            break

    edges_deg.unpersist()
    return ranks.select(F.col("id").alias(id_col), F.col("rank").alias("pagerank"))


def attach_pagerank(docs: DataFrame, ranks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Write ranks back into the docs table (documents.idx offset+60
    patch, Indexer.java:1082-1104, as a column overwrite)."""
    return (
        docs.drop("pagerank")
        .join(ranks, id_col, "left")
        .fillna({"pagerank": 0.0})
    )
