"""Query auto-complete: top-k vocabulary terms by document frequency
under a prefix.

Scale shape: the vocabulary table is written SORTED by term
(index/builder.write_index sorts within partitions), so a prefix filter
is a ``StartsWith`` predicate that pushes into the parquet scan and
prunes row groups by the term column's min/max statistics — a prefix
lookup reads the few row groups covering ``[prefix, prefix+0xFF)``,
not the vocabulary.  The top-k is a TakeOrderedAndProject.

Each prefix is its own pushed-down scan (a handful per keystroke);
deliberately NOT a non-equi join of a prefix table against the
vocabulary, which would plan as a BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def suggest_prefix(terms: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """terms(term, df) -> (prefix, term, df, rank): the k most frequent
    vocabulary terms starting with ``prefix`` (df DESC, term ASC)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("df"), F.asc("term"))
    ranked = (
        terms.filter(F.col("term").startswith(prefix))
        .select(F.lit(prefix).alias("prefix"), "term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )
    # rank AFTER the limit: the window runs over <= k rows (driver-merge
    # sized), never over the full prefix match set
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


def suggest_prefixes(terms: DataFrame, prefixes: list[str], k: int = 10) -> DataFrame:
    """Union of per-prefix suggestions — one pushed-down scan each."""
    out = suggest_prefix(terms, prefixes[0], k)
    for p in prefixes[1:]:
        out = out.unionByName(suggest_prefix(terms, p, k))
    return out
