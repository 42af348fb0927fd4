"""Positional (phrase) search over the positions column.

The compressed-index spec (BASELINE.json north_star) stores per-posting
position lists ``term -> [docID, tf, positions]``; this operator is what
justifies them: exact phrase match "t1 t2 ... tk" = docs where some
position chain p, p+1, ..., p+k-1 hits each term in order.  Positions
are PRE-FILTER token offsets (analyzer.tokenize), the classic positional
-index convention, so stopword removal leaves gaps and phrases across a
removed stopword do NOT match — intentional and documented.

Plan shape: k self-joins of the postings table on doc (each pruned to
one term — at scale each probe hits one term bucket), then a pure
column-expression position-chain intersection:
``cur = array_intersect(transform(cur, +1), positions_i)``.
No Python, no explode of positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..index.builder import IndexTables


def phrase_search(
    index: IndexTables,
    phrase_terms: list[str],
    k: int = 10,
    count_as_score: bool = True,
) -> DataFrame:
    """-> (doc_id, score) where score = number of phrase occurrences.

    ``phrase_terms`` must already be analyzed (same pipeline as the
    index).  Duplicate-adjacent terms ("the the") are handled naturally
    by the chain intersection.
    """
    if not phrase_terms:
        spark = index.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score long")
    if "positions" not in index.postings.columns:
        raise ValueError("index was built without positions (with_positions=False)")

    base = (
        index.postings.filter(F.col("term") == phrase_terms[0])
        .select("doc_id", F.col("positions").alias("chain"))
    )
    for i, t in enumerate(phrase_terms[1:], start=1):
        nxt = index.postings.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"_p{i}")
        )
        base = (
            base.join(nxt, "doc_id", "inner")
            .withColumn(
                "chain",
                F.array_intersect(
                    F.transform(F.col("chain"), lambda x: x + 1), F.col(f"_p{i}")
                ),
            )
            .drop(f"_p{i}")
            .filter(F.size("chain") > 0)
        )
    out = base.select(
        "doc_id", F.size("chain").cast("long").alias("score")
    )
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def proximity_search(
    index: IndexTables,
    term_a: str,
    term_b: str,
    k: int = 10,
) -> DataFrame:
    """Proximity ranking: docs containing BOTH terms, ranked by the
    minimum token distance between any occurrence pair (ascending —
    closer is better), ties broken by doc_id.

    -> (doc_id, min_dist, n_a, n_b).

    Min pair distance is found by a SORTED-MERGE over the two position
    lists, not a cross product: encode a-positions as ``2p`` and
    b-positions as ``2p+1``, sort the union, and take the min gap over
    adjacent elements of DIFFERENT parity (the classic two-pointer
    argument: the closest (a, b) pair is adjacent in the merge).  Cost
    is O((tf_a + tf_b) log) per doc instead of O(tf_a * tf_b) — a hot
    document with thousands of occurrences of both terms stays linear,
    which is what survives a 100x corpus.  Pure column expressions.
    """
    if term_a == term_b:
        raise ValueError("proximity_search needs two distinct terms")
    if "positions" not in index.postings.columns:
        raise ValueError("index was built without positions (with_positions=False)")

    pa = index.postings.filter(F.col("term") == term_a).select(
        "doc_id", F.col("positions").alias("_pa"))
    pb = index.postings.filter(F.col("term") == term_b).select(
        "doc_id", F.col("positions").alias("_pb"))
    j = pa.join(pb, "doc_id", "inner")
    merged = F.array_sort(
        F.concat(
            F.transform(F.col("_pa"), lambda x: x * 2),
            F.transform(F.col("_pb"), lambda x: x * 2 + 1),
        )
    )
    out = (
        j.withColumn("_m", merged)
        .withColumn(
            "min_dist",
            F.expr(
                "array_min(filter(transform(sequence(1, size(_m) - 1),"
                " i -> IF((element_at(_m, i + 1) % 2) <> (element_at(_m, i) % 2),"
                "         (element_at(_m, i + 1) div 2) - (element_at(_m, i) div 2),"
                "         CAST(NULL AS BIGINT))),"
                " x -> x IS NOT NULL))"
            ),
        )
        .select(
            "doc_id",
            F.col("min_dist").cast("long").alias("min_dist"),
            F.size("_pa").cast("long").alias("n_a"),
            F.size("_pb").cast("long").alias("n_b"),
        )
    )
    return out.orderBy(F.asc("min_dist"), F.asc("doc_id")).limit(k)

def snippet_search(
    index: IndexTables,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Best-snippet extraction: for every doc containing ALL query
    terms, the minimal token window [win_start, win_end] covering at
    least one occurrence of each term — the classic "minimum window
    containing all query terms" snippet/highlight primitive (Lucene's
    unified highlighter computes the same window from the positional
    index; the reference stores per-posting positions for exactly this
    family of operators, Indexer.java posting layout).

    -> (doc_id, win_start, win_end, width) ordered by width ASC (the
    tightest snippet in the corpus first), doc_id ASC, limit k.

    Algorithm (pure column expressions, no Python): the optimal
    window's LEFT edge is always an occurrence of some query term, so
    enumerate every occurrence s in the merged position list and pair
    it with the minimal end(s) = max over terms t of min{p in pos_t :
    p >= s}; a start whose suffix lacks some term yields NULL and is
    filtered.  Best = lexicographic min over (width, start) structs —
    deterministic.  Per-doc cost is O(L^2) in L = total query-term
    occurrences in that one doc (tiny: L counts QUERY-term hits, not
    doc length); at serving scale this runs on the top-k candidate
    docs only, so the bound is k * L^2, independent of corpus size.
    """
    if not terms:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "doc_id long, win_start long, win_end long, width long")
    if "positions" not in index.postings.columns:
        raise ValueError("index was built without positions (with_positions=False)")
    if len(set(terms)) != len(terms):
        raise ValueError("snippet terms must be distinct")

    base = (
        index.postings.filter(F.col("term") == terms[0])
        .select("doc_id", F.col("positions").alias("_p0"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = index.postings.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"_p{i}"))
        base = base.join(nxt, "doc_id", "inner")

    pcols = ", ".join(f"_p{i}" for i in range(len(terms)))
    ends = ", ".join(
        f"array_min(filter(_p{i}, p -> p >= s))" for i in range(len(terms)))
    # candidate struct per start s: (width, start, end); a start whose
    # suffix lacks some term yields a NULL min-end — marked as NULL
    # width inside the transform and dropped by the filter
    cand = (
        f"filter(transform(array_sort(concat({pcols})),"
        f" s -> named_struct("
        f"   'width', CASE WHEN {' OR '.join(f'array_min(filter(_p{i}, p -> p >= s)) IS NULL' for i in range(len(terms)))}"
        f"            THEN CAST(NULL AS BIGINT)"
        f"            ELSE array_max(array({ends})) - s END,"
        f"   'win_start', s,"
        f"   'win_end', array_max(array({ends})))),"
        f" c -> c.width IS NOT NULL)"
    )
    out = (
        base.withColumn("_best", F.expr(f"array_min({cand})"))
        .select(
            "doc_id",
            F.col("_best.win_start").cast("long").alias("win_start"),
            F.col("_best.win_end").cast("long").alias("win_end"),
            F.col("_best.width").cast("long").alias("width"),
        )
    )
    return out.orderBy(F.asc("width"), F.asc("doc_id")).limit(k)
