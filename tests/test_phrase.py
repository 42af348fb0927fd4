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


def test_proximity_sorted_merge_equals_bruteforce(pos_index, spark):
    from itertools import product

    from information_retrieval_system_spark.query.phrase import proximity_search

    out = {r.doc_id: (r.min_dist, r.n_a, r.n_b) for r in
           proximity_search(pos_index, "quick", "brown", k=100).collect()}
    # brute force over the same postings
    rows = pos_index.postings.filter(
        pos_index.postings.term.isin("quick", "brown")).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.term] = list(r.positions)
    expect = {}
    for d, ps in by_doc.items():
        if "quick" in ps and "brown" in ps:
            md = min(abs(x - y) for x, y in product(ps["quick"], ps["brown"]))
            expect[d] = (md, len(ps["quick"]), len(ps["brown"]))
    assert out == expect
    assert out[1][0] == 1          # adjacent
    assert out[4][0] == 3          # "quick stop the brown": pre-filter offsets 0 vs 3


def test_proximity_rejects_same_term(pos_index):
    import pytest as _pt

    from information_retrieval_system_spark.query.phrase import proximity_search

    with _pt.raises(ValueError):
        proximity_search(pos_index, "quick", "quick")


def test_snippet_min_window_equals_bruteforce(spark):
    """Engine's candidate-start expression vs a brute-force min-window
    scan over every (start, end) token pair."""
    from information_retrieval_system_spark.query.phrase import snippet_search

    rows = [
        (1, "alpha beta gamma alpha delta beta"),   # tight window at the end
        (2, "alpha zzz zzz zzz beta zzz gamma"),    # wide window, one each
        (3, "beta gamma alpha"),                    # reversed order still covers
        (4, "alpha beta alpha beta"),               # gamma missing -> excluded
        (5, "gamma beta alpha gamma beta alpha"),   # repeated tight windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(use_stemmer=False, use_stopwords=False)
    ix = build_index(df, cfg, doc_col="doc_id", text_col="text",
                     with_positions=True)
    terms = ["alpha", "beta", "gamma"]
    got = {r.doc_id: (r.win_start, r.win_end, r.width)
           for r in snippet_search(ix, terms, k=10).collect()}

    # brute force: all (start, end) windows, pick min (width, start)
    expect = {}
    for doc_id, text in rows:
        toks = text.split()
        best = None
        for s in range(len(toks)):
            for e in range(s, len(toks)):
                win = set(toks[s:e + 1])
                if all(t in win for t in terms):
                    c = (e - s, s, e)
                    if best is None or c < best:
                        best = c
                    break
        if best is not None:
            expect[doc_id] = (best[1], best[2], best[0])
    assert got == expect
    assert 4 not in got


def test_snippet_validation(spark):
    from information_retrieval_system_spark.query.phrase import snippet_search

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    cfg = EngineConfig(use_stemmer=False, use_stopwords=False)
    no_pos = build_index(df, cfg, doc_col="doc_id", text_col="text",
                         with_positions=False)
    with pytest.raises(ValueError, match="positions"):
        snippet_search(no_pos, ["a", "b"])
    ix = build_index(df, cfg, doc_col="doc_id", text_col="text",
                     with_positions=True)
    with pytest.raises(ValueError, match="distinct"):
        snippet_search(ix, ["a", "a"])
    assert snippet_search(ix, [], k=5).count() == 0
