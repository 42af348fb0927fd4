"""SymSpell-style query-term spelling correction over the vocabulary.

A distance-1 typo (insert/delete/substitute, and transpositions at
distance-2-but-adjacent) shares at least one DELETE-ONE-CHARACTER
variant with the intended term, so candidate generation is an
EQUI-join on deletion variants — never a vocabulary scan per query
term, never a cross join:

- build side: explode each vocabulary term into its deletion-1
  neighborhood (term itself + one variant per character ⇒ ``len+1``
  rows per term — linear in total vocabulary characters; at scale this
  is a written table keyed by variant);
- query side: the same expression over the query terms;
- candidates = equi-join on the variant, VERIFIED with
  ``levenshtein() <= max_distance`` (blocking is a superset — e.g.
  "abcd"/"axyd" share no variant but "abcd"/"abed" and "abcd"/"bacd"
  do), ranked (distance ASC, df DESC, term ASC), top-1 per query term.

Both sides are exact SQL-expressible (DuckDB has ``levenshtein`` and
list comprehension for deletions), so the corrector is oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def deletion_variants_expr(col: Column) -> Column:
    """array<string>: the string itself plus every delete-one-char
    variant (distinct)."""
    variants = F.transform(
        F.sequence(F.lit(0), F.length(col) - 1),
        lambda i: F.concat(col.substr(F.lit(1), i), col.substr(i + F.lit(2), F.length(col))),
    )
    return F.array_distinct(F.array_union(F.array(col), variants))


def vocab_deletion_index(terms: DataFrame) -> DataFrame:
    """terms(term, df) -> (variant, term, df): the deletion-1 lookup
    table (persist/partition by variant at scale)."""
    return terms.select(
        "term", "df",
        F.explode(deletion_variants_expr(F.col("term"))).alias("variant"),
    )


def correct_terms(
    terms: DataFrame,
    query_terms: DataFrame,
    max_distance: int = 1,
    qcol: str = "qterm",
) -> DataFrame:
    """query_terms(qterm) -> (qterm, suggestion, df, distance): the best
    vocabulary correction within ``max_distance`` edits (NULLs when no
    candidate).  An exact vocabulary hit suggests itself (distance 0)."""
    vidx = vocab_deletion_index(terms)
    qv = query_terms.select(
        F.col(qcol),
        F.explode(deletion_variants_expr(F.col(qcol))).alias("variant"),
    )
    cand = (
        qv.join(vidx, "variant")
        .select(qcol, "term", "df")
        .distinct()
        .withColumn("distance", F.levenshtein(F.col(qcol), F.col("term")))
        .filter(F.col("distance") <= max_distance)
    )
    w = Window.partitionBy(qcol).orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term")
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(qcol, F.col("term").alias("suggestion"), "df", "distance")
    )
    return query_terms.join(best, qcol, "left")
