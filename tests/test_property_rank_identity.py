"""Property-style rank identity: seeded random corpora + random queries,
engine vs pure-Python oracle (SURVEY.md §5.5).

One Spark job per corpus (not per hypothesis example — JVM round-trips
would dominate), with the randomness seeded and the corpus shapes chosen
to hit edge paths: empty docs, single-token docs, all-stopword docs,
duplicate docs (tie-break), unicode tokens, digit-glued identifiers.
"""

from __future__ import annotations

import random

import pytest

from information_retrieval_system_spark.analysis.analyzer import analyze_query_terms
from information_retrieval_system_spark.config import EngineConfig
from information_retrieval_system_spark.index.builder import build_index
from information_retrieval_system_spark.oracle.pyref import OracleIndex
from information_retrieval_system_spark.query import scoring

VOCAB = (
    "alpha beta gamma delta merge7 sort3x the of and running runs easily "
    "généralisation λέξη index merge partition shuffle codegen vector "
    "a-b.c(d) under_score CamelCase UPPER mixedCase123"
).split()


def _corpus(seed: int, n_docs: int) -> dict[int, str]:
    rng = random.Random(seed)
    docs = {}
    for i in range(n_docs):
        kind = rng.random()
        if kind < 0.05:
            docs[i] = ""
        elif kind < 0.10:
            docs[i] = "the of and"
        elif kind < 0.15 and i > 0:
            docs[i] = docs[rng.randrange(i)]  # duplicate -> tie-break
        else:
            docs[i] = " ".join(rng.choices(VOCAB, k=rng.randint(1, 60)))
    return docs


QUERY_POOL = ["merge index", "running easily", "λέξη vector", "the and of",
              "camelcase upper", "sort x alpha", "partition shuffle codegen",
              "merge merge merge", "absentterm999"]


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_random_corpus_rank_identity(spark, seed):
    cfg = EngineConfig()
    docs = _corpus(seed, 120)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    index = build_index(df, cfg, doc_col="doc_id", text_col="text")
    oracle = OracleIndex(dict(docs), cfg.use_stopwords, cfg.use_stemmer)

    assert index.stats["n_docs"] == oracle.n
    assert index.stats["avgdl"] == oracle.avgdl
    eng_df = {r.term: r.df for r in index.terms.collect()}
    assert eng_df == oracle.df

    rng = random.Random(seed * 31)
    for query in rng.sample(QUERY_POOL, 5):
        k = rng.choice([3, 10, 50])
        qt = analyze_query_terms(spark, query, cfg)
        eng = [(r.doc_id, r.score) for r in
               scoring.bm25_search(index, qt, k=k, cfg=cfg).collect()]
        exp = oracle.bm25(query, k=k, k1=cfg.k1, b=cfg.b)
        assert [d for d, _ in eng] == [d for d, _ in exp], (seed, query)
        for (d1, s1), (d2, s2) in zip(eng, exp):
            assert abs(s1 - s2) <= 1e-9 * max(1.0, abs(s2)), (seed, query, d1)
