"""SymSpell-style query-term spelling correction over the vocabulary.

A distance-1 typo (insert/delete/substitute, and adjacent
transpositions — 1 edit under Damerau/OSA, 2 under plain Levenshtein)
shares at least one DELETE-ONE-CHARACTER variant with the intended
term, so candidate generation is an EQUI-join on deletion variants —
never a vocabulary scan per query term, never a cross join:

- build side: explode each vocabulary term into its deletion-1
  neighborhood (term itself + one variant per character ⇒ ``len+1``
  rows per term — linear in total vocabulary characters; at scale this
  is a written table keyed by variant);
- query side: the same expression over the query terms;
- candidates = equi-join on the variant, VERIFIED with a
  Damerau-style distance: ``levenshtein() <= max_distance`` OR the
  candidate is an adjacent transposition of the query term (distance 1
  — plain ``levenshtein`` alone scores it 2 and would silently drop
  it).  Blocking is a superset of both cases: "abcd"/"abed" share
  variant "abd", and the transposed pair "abcd"/"bacd" shares "bcd"
  (deleting either swapped character yields the same string).  Ranked
  (distance ASC, df DESC, term ASC), top-1 per query term.

Both sides are exact SQL-expressible (DuckDB has ``levenshtein`` and
list comprehension for deletions/transpositions), so the corrector is
oracle-gated.
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


def transposition_variants_expr(col: Column) -> Column:
    """array<string>: every adjacent-swap variant of the string (empty
    array below length 2).  An adjacent transposition is ONE edit under
    Damerau/OSA; these variants let the verifier recognize it without a
    quadratic alignment."""
    swaps = F.transform(
        # i = 1..len-1 (1-based position of the left swapped char)
        F.sequence(F.lit(1), F.length(col) - 1),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1),        # prefix before the pair
            col.substr(i + 1, F.lit(1)),        # right char first
            col.substr(i, F.lit(1)),            # then left char
            col.substr(i + F.lit(2), F.length(col)),  # suffix after the pair
        ),
    )
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard short strings
    return F.when(F.length(col) >= 2, swaps).otherwise(
        F.array().cast("array<string>")
    )


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
    vocabulary correction within ``max_distance`` Damerau/OSA edits
    (NULLs when no candidate).  An exact vocabulary hit suggests itself
    (distance 0); an adjacent transposition counts as distance 1."""
    vidx = vocab_deletion_index(terms)
    qv = query_terms.select(
        F.col(qcol),
        F.explode(deletion_variants_expr(F.col(qcol))).alias("variant"),
    )
    lev = F.levenshtein(F.col(qcol), F.col("term"))
    is_transposition = F.array_contains(
        transposition_variants_expr(F.col(qcol)), F.col("term")
    ) & (F.col(qcol) != F.col("term"))
    cand = (
        qv.join(vidx, "variant")
        .select(qcol, "term", "df")
        .distinct()
        .withColumn(
            "distance",
            F.when(is_transposition, F.least(lev, F.lit(1))).otherwise(lev),
        )
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
