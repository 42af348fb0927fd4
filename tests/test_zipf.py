"""Zipf corpus generator + batched VByte block encoding."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from information_retrieval_system_spark.index.compression import (
    _encode_pairs,
    delta_encode,
    vbyte_decode,
    vbyte_encode,
)
from information_retrieval_system_spark.sources.zipf import rank_token, zipf_corpus


def test_zipf_deterministic_and_analyzer_safe(spark):
    a = zipf_corpus(spark, 200, vocab=5000).orderBy("doc_id").collect()
    b = zipf_corpus(spark, 200, vocab=5000).orderBy("doc_id").collect()
    assert [(r.doc_id, r.text) for r in a] == [(r.doc_id, r.text) for r in b]
    # letters-only tokens: the analyzer strips digits, so "t123" would
    # collapse the vocabulary to one term
    for r in a[:20]:
        assert re.fullmatch(r"[a-z ]+", r.text), r.text


def test_zipf_rank_order(spark):
    from pyspark.sql import functions as F

    docs = zipf_corpus(spark, 3000, vocab=10_000)
    toks = docs.select(F.explode(F.split("text", " ")).alias("t"))
    counts = {r.t: r.n for r in toks.groupBy("t").agg(F.count("*").alias("n")).collect()}
    # head ranks strictly dominate the tail (sampled at decade spacing)
    c = [counts.get(rank_token(r), 0) for r in (1, 10, 100, 1000)]
    assert c[0] > c[1] > c[2] > c[3] > 0


def test_encode_pairs_matches_per_block_encoding():
    blocks_docs = [np.array([5, 9, 1000], dtype=np.uint64),
                   np.array([0], dtype=np.uint64),
                   np.array([2**40, 2**40 + 3], dtype=np.uint64)]
    blocks_vals = [np.array([1, 2, 3], dtype=np.uint64),
                   np.array([7], dtype=np.uint64),
                   np.array([1, 1], dtype=np.uint64)]
    out = _encode_pairs(pd.Series(blocks_docs), pd.Series(blocks_vals))
    for i in range(3):
        assert out["docs_vb"][i] == vbyte_encode(delta_encode(blocks_docs[i]))
        assert out["vals_vb"][i] == vbyte_encode(blocks_vals[i])
        # round-trip
        got = np.cumsum(vbyte_decode(out["docs_vb"][i]), dtype=np.uint64)
        assert (got == blocks_docs[i]).all()


def test_encode_pairs_empty_batch():
    out = _encode_pairs(pd.Series([], dtype=object), pd.Series([], dtype=object))
    assert len(out) == 0
