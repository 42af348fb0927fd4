"""Deterministic Zipf-vocabulary synthetic corpus.

The driver testdata's documents table has a 31-term vocabulary, which
makes block-max pruning useless by construction (every block contains
every term at high tf, so no upper bound can discriminate — BENCH.md
round 1).  Real corpora are Zipfian: a few ubiquitous terms and a long
selective tail — exactly the regime WAND exists for.  This generator
produces that shape with NO RNG state: every token is a pure hash
function of (seed, doc_id, position), so any worker can regenerate any
partition independently (the same property that makes the corpus safe
to generate at cluster scale — it is embarrassingly parallel and
re-entrant for task retries).

Sampling: token rank r = floor(V^u) with u hash-uniform in [0,1) gives
P(r) ∝ 1/r (Zipf s=1) over a vocabulary of V terms ("t1".."tV").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: large prime for hash -> uniform [0,1)
_P = 2_147_483_647


def _uniform(*cols) -> "F.Column":
    return F.pmod(F.xxhash64(*cols), F.lit(_P)) / F.lit(float(_P))


def zipf_corpus(
    spark: SparkSession,
    n_docs: int,
    vocab: int = 100_000,
    min_len: int = 40,
    max_len: int = 80,
    seed: int = 7,
    partitions: int | None = None,
) -> DataFrame:
    """-> (doc_id long, text string): ``n_docs`` documents of
    hash-deterministic Zipf tokens over a ``vocab``-term vocabulary."""
    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    dl = (F.lit(min_len)
          + F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(max_len - min_len + 1))
          ).cast("int")

    def token_at(p):
        u = _uniform(F.lit(seed), F.col("doc_id"), p)
        rank = F.floor(F.pow(F.lit(float(vocab)), u)).cast("long")
        # letters-only token (the analyzer strips digits): rank digits
        # mapped a..j, e.g. rank 123 -> "tbcd"
        return F.concat(F.lit("t"),
                        F.translate(rank.cast("string"), "0123456789", "abcdefghij"))

    return (
        base.select(F.col("id").alias("doc_id"), dl.alias("_dl"))
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.transform(F.sequence(F.lit(1), F.col("_dl")), token_at)
            ).alias("text"),
        )
    )


def rank_token(rank: int) -> str:
    """The token string for a vocabulary rank (1 = most frequent)."""
    return "t" + str(rank).translate(str.maketrans("0123456789", "abcdefghij"))
