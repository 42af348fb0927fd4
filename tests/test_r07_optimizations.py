"""Focused pins for the round-7 optimization rewrites: each changed
operator internal is asserted equal to a straightforward reference
formulation (the pre-optimization shape), so a future regression in the
optimized plan shows up here, not only in the slow oracle gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from information_retrieval_system_spark.session import get_spark

    return get_spark("test-r07", parallelism=4, shuffle_partitions=4)


# --- shingles_expr (zip_with chain) vs the transform+slice reference ----


def _ref_shingles(col, n):
    toks_ref = __import__(
        "information_retrieval_system_spark.analysis.analyzer",
        fromlist=["tokens_array_expr"]).tokens_array_expr(col)
    return F.when(F.size(toks_ref) < n, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(0), F.size(toks_ref) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks_ref, i + 1, n))))


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_shingles_zipwith_equals_reference(spark, n):
    from information_retrieval_system_spark.textops.dedup import shingles_expr

    texts = [
        "", "one", "a b", "a b c", "a b c d e f", "dup dup dup dup",
        "Mixed CASE tokens 123 split-on_punct", "x " * 50, None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        shingles_expr(F.col("t"), n).alias("new"),
        _ref_shingles(F.col("t"), n).alias("ref"),
    ).collect()
    for r in rows:
        assert r["new"] == r["ref"]


# --- lsh_candidate_pairs (single (band,bkey) join) vs per-band loop -----


def test_lsh_banding_equals_per_band_loop(spark):
    from information_retrieval_system_spark.textops import dedup
    from information_retrieval_system_spark.textops.dedup import _band_key

    # groups of IDENTICAL texts guarantee band collisions (non-empty
    # candidate set) while distinct groups exercise bucket separation
    docs = [(i, f"common tokens here plus group{i % 5} body words")
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = dedup.minhash_signatures(df, "text", "doc_id", n=2, num_hashes=8)
    bands, rpb, cap = 4, 2, 100  # cap must not bind here (cap semantics
    # are pinned by test_lsh_bucket_cap_drops_degenerate_bucket)

    got = {(r.id_a, r.id_b): r.n_bands for r in
           dedup.lsh_candidate_pairs(sigs, bands, rpb, cap).collect()}

    # reference: the pre-r7 per-band loop
    frames = []
    s = sigs.localCheckpoint(eager=True)
    for b in range(bands):
        banded = s.select(F.col("id"), _band_key(b, rpb))
        ok = banded.groupBy("bkey").agg(F.count("*").alias("c")).filter(
            F.col("c") <= cap)
        banded = banded.join(ok.select("bkey"), "bkey", "leftsemi")
        l = banded.select(F.col("id").alias("id_a"), "bkey")
        r = banded.select(F.col("id").alias("id_b"), "bkey")
        frames.append(l.join(r, "bkey").filter(F.col("id_a") < F.col("id_b"))
                      .select("id_a", "id_b"))
    allp = frames[0]
    for f in frames[1:]:
        allp = allp.unionByName(f)
    ref = {(r.id_a, r.id_b): r.n_bands for r in
           allp.groupBy("id_a", "id_b").agg(F.count("*").alias("n_bands")).collect()}
    assert got == ref and len(got) > 0


# --- _buckets_of vs the written layout's gbucket column ------------------


def test_buckets_of_matches_layout_hash(spark, tmp_path):
    from information_retrieval_system_spark.index.trigram import (
        _buckets_of, trigram_postings, write_trigram_index)

    df = spark.createDataFrame(
        [(1, "spark join merge"), (2, "vector stream")],
        "doc_id long, text string")
    out = str(tmp_path / "tri")
    write_trigram_index(trigram_postings(df, "text", "doc_id"), out,
                        gram_buckets=8)
    layout = {r.gram: r.gbucket for r in
              spark.read.parquet(f"{out}/postings").collect()}
    resolved = _buckets_of(sorted(layout), 8)
    assert resolved == layout


# --- WAND decode memo: cached decode identical to fresh decode ----------


def test_decode_memo_matches_fresh_decode():
    import numpy as np

    from information_retrieval_system_spark.index.compression import (
        vbyte_decode, vbyte_encode)
    from information_retrieval_system_spark.query import wand

    wand._DECODE_VALS.clear(); wand._DECODE_DOCS.clear()
    gaps = [3, 1, 4, 1, 5, 9, 2, 6]
    vb = bytes(vbyte_encode(gaps))
    fresh_vals = vbyte_decode(vb)
    fresh_docs = np.cumsum(fresh_vals, dtype=np.uint64)
    assert list(wand._cached_vals(vb)) == list(fresh_vals)
    assert list(wand._cached_docs(vb)) == list(fresh_docs)
    # second call returns the SAME array object (memo hit), values intact
    again = wand._cached_docs(vb)
    assert again is wand._DECODE_DOCS[vb]
    assert list(again) == list(fresh_docs)
    # a different payload must not collide
    vb2 = bytes(vbyte_encode([7, 7]))
    assert list(wand._cached_vals(vb2)) == [7, 7]


# --- append gramdf == from-scratch gramdf (full-table equality) ---------


def test_append_gramdf_equals_scratch_build(spark, tmp_path):
    from information_retrieval_system_spark.index.trigram import (
        append_trigram_delta, trigram_postings, write_trigram_index)

    docs = spark.createDataFrame(
        [(i, f"some shared text body number{i} tail{i % 3}") for i in range(20)],
        "doc_id long, text string")
    first = docs.filter("doc_id < 12")
    rest = docs.filter("doc_id >= 12")

    inc = str(tmp_path / "inc")
    write_trigram_index(trigram_postings(first, "text", "doc_id"), inc,
                        gram_buckets=4)
    append_trigram_delta(rest, inc, "text", "doc_id", gram_buckets=4)

    full = str(tmp_path / "full")
    write_trigram_index(trigram_postings(docs, "text", "doc_id"), full,
                        gram_buckets=4)

    a = {(r.gram, r.gbucket): r.df for r in
         spark.read.parquet(f"{inc}/gramdf").collect()}
    b = {(r.gram, r.gbucket): r.df for r in
         spark.read.parquet(f"{full}/gramdf").collect()}
    assert a == b
