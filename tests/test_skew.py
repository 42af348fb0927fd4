"""Salted posting-array aggregation == naive collect; skew stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from information_retrieval_system_spark.config import EngineConfig
from information_retrieval_system_spark.index.builder import build_index
from information_retrieval_system_spark.index.skew import salted_posting_arrays, skew_stats


@pytest.fixture(scope="module")
def ix(spark, sf_small):
    cfg = EngineConfig()
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    return build_index(docs, cfg, doc_col="doc_id", text_col="text",
                       with_positions=False)


def test_salted_equals_naive(spark, ix):
    cfg = EngineConfig(salt_buckets=4)
    salted = {
        r.term: (r.df, [(p.doc_int, p.tf) for p in r.postings])
        for r in salted_posting_arrays(ix.postings, cfg).collect()
    }
    naive = {
        r.term: (r.df, [(p.doc_int, p.tf) for p in r.postings])
        for r in ix.postings.groupBy("term").agg(
            F.count("*").cast("long").alias("df"),
            F.sort_array(F.collect_list(F.struct("doc_int", "tf"))).alias("postings"),
        ).collect()
    }
    assert salted == naive


def test_skew_stats_shape(ix):
    st = skew_stats(ix.postings, ix.stats["n_docs"], top=5)
    assert len(st["hot_terms"]) == 5
    dfs = [t["df"] for t in st["hot_terms"]]
    assert dfs == sorted(dfs, reverse=True)
    assert 0 < st["max_df_ratio"] <= 1.0
