"""Positional phrase search: adjacency, multiplicity, stopword gaps."""

from __future__ import annotations

import pytest

from information_retrieval_system_spark.config import EngineConfig
from information_retrieval_system_spark.index.builder import build_index
from information_retrieval_system_spark.query.phrase import phrase_search


@pytest.fixture(scope="module")
def pos_index(spark):
    rows = [
        (1, "quick brown fox and quick brown cat"),
        (2, "brown quick nothing here"),
        (3, "quick brown quick brown quick brown"),
        (4, "quick stop the brown"),         # stopword gap breaks adjacency
        (5, "the quick brown end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig()  # stopwords+stemmer ON: positions are pre-filter
    return build_index(df, cfg, doc_col="doc_id", text_col="text",
                       with_positions=True)


def test_phrase_counts(pos_index):
    out = {r.doc_id: r.score for r in
           phrase_search(pos_index, ["quick", "brown"], k=10).collect()}
    assert out == {3: 3, 1: 2, 5: 1}
    # doc 2 reversed order, doc 4 gap ("stop the" removed but positions
    # keep the gap) -> no match
    assert 2 not in out and 4 not in out


def test_phrase_three_terms(pos_index):
    out = {r.doc_id: r.score for r in
           phrase_search(pos_index, ["quick", "brown", "fox"], k=10).collect()}
    assert out == {1: 1}


def test_phrase_absent_and_empty(pos_index):
    assert phrase_search(pos_index, ["quick", "zebra"], k=10).count() == 0
    assert phrase_search(pos_index, [], k=10).count() == 0


def test_phrase_requires_positions(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    ix = build_index(df, EngineConfig(), doc_col="doc_id", text_col="text",
                     with_positions=False)
    with pytest.raises(ValueError, match="positions"):
        phrase_search(ix, ["a", "b"])
