"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame/SQL plans (no per-row Python):

- exact:      sha256(content) groupBy — one shuffle, trivially scalable.
- ngram Jaccard: shingle -> inverted shingle index -> pair-generation
  WITHIN shingle buckets -> Jaccard from co-occurrence counts.  The
  classic |A∩B| / (|A|+|B|-|A∩B|) identity means we never materialize
  shingle sets per pair — only counts.  Pair blow-up is bounded by
  dropping ultra-common shingles (df cap), the standard trick at scale.
- MinHash + LSH: 60-bit portable shingle hashes -> H affine min-hashes
  (one groupBy with H min() aggregates — a single shuffle) -> band keys
  -> candidate pairs from band buckets (self-join within bucket) ->
  optional exact-Jaccard verify.
- SimHash: 64-bit sign-of-weighted-sum fingerprint; near-dups = equal
  fingerprints (or small Hamming distance via band rotation).
- embedding cosine near-dup: see similarity.py.

Each has an exact DuckDB oracle in entry_queries (same md5-based h60).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..analysis.analyzer import tokens_array_expr
from .hashing import MINHASH_P, h60, minhash_expr, minhash_params


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """-> (content_sha, n_docs, canonical_id): groups of byte-identical
    texts (n_docs >= 2); canonical = min id (the keep-one policy)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_sha"), F.col(id_col).alias("_id"))
        .groupBy("content_sha")
        .agg(F.count("*").alias("n_docs"), F.min("_id").alias("canonical_id"))
        .filter(F.col("n_docs") >= 2)
    )


def shingles_expr(text_col: Column, n: int) -> Column:
    """Word n-gram shingles as an array<string> (distinct not applied)."""
    toks = tokens_array_expr(text_col)
    return F.when(F.size(toks) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def shingle_table(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """-> (id, shingle) DISTINCT rows (set semantics for Jaccard)."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingles_expr(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """-> (id_a, id_b, jaccard) for pairs above threshold (id_a < id_b).

    Count-based: sizes per doc, intersections from a self-join of the
    shingle table on shingle.  ``max_shingle_df`` drops shingles shared
    by more than that many docs before pair generation (skew guard)."""
    sh = shingle_table(df, text_col, id_col, n)
    if max_shingle_df is not None:
        keep = sh.groupBy("shingle").agg(F.count("*").alias("sdf")).filter(
            F.col("sdf") <= max_shingle_df
        )
        sh_p = sh.join(keep.select("shingle"), "shingle", "leftsemi")
    else:
        sh_p = sh
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh_p.select(F.col("id").alias("id_a"), "shingle")
    b = sh_p.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """-> (id, mh_0..mh_{H-1}): one groupBy with H min() aggregates."""
    sh = shingle_table(df, text_col, id_col, n).withColumn("h", h60(F.col("shingle")))
    params = minhash_params(num_hashes, seed)
    aggs = [
        F.min(minhash_expr(F.col("h"), a, b)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """-> (id_a, id_b, n_bands): pairs sharing >=1 LSH band.

    band key = concat of the band's signature components; self-join per
    band bucket, deduped across bands with a count of matching bands."""
    pair_frames = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        banded = signatures.select(
            F.col("id"), F.concat_ws("_", *[c.cast("string") for c in cols]).alias("bkey")
        )
        l = banded.select(F.col("id").alias("id_a"), "bkey")
        r = banded.select(F.col("id").alias("id_b"), "bkey")
        pair_frames.append(
            l.join(r, "bkey").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        )
    allp = pair_frames[0]
    for f in pair_frames[1:]:
        allp = allp.unionByName(f)
    return allp.groupBy("id_a", "id_b").agg(F.count("*").alias("n_bands"))


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Full pipeline: signatures -> band candidates -> exact-Jaccard
    verify -> (id_a, id_b, jaccard >= threshold)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes, seed)
    cand = lsh_candidate_pairs(sigs, bands, rows_per_band)
    verified = ngram_jaccard_pairs(df, text_col, id_col, n, threshold)
    return cand.join(verified, ["id_a", "id_b"], "inner").select("id_a", "id_b", "jaccard")


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """-> (id, simhash): sign of per-bit tf-weighted sums of token h60
    hashes (h60 gives 60 usable bits; ``bits`` <= 60)."""
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens_array_expr(F.col(text_col))).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", h60(F.col("tok")))
    )
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"s_{j}")
            for j in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(F.col(f"s_{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("id", fp.alias("simhash"))


def simhash_duplicate_groups(df: DataFrame, text_col: str, id_col: str,
                             bits: int = 32) -> DataFrame:
    """-> (simhash, n_docs, canonical_id): exact-fingerprint collisions."""
    sh = simhash(df, text_col, id_col, bits)
    return (
        sh.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("canonical_id"))
        .filter(F.col("n_docs") >= 2)
    )
