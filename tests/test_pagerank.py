"""PageRank: DataFrame loop vs pure-Python power-iteration oracle,
including dangling-edge drop, zero-in-degree rank retention, and a cycle
(FIXTURES.md §3)."""

from __future__ import annotations

import pytest

from information_retrieval_system_spark.config import EngineConfig
from information_retrieval_system_spark.graph.pagerank import attach_pagerank, pagerank, resolve_edges
from information_retrieval_system_spark.oracle.pyref import pagerank as py_pagerank


@pytest.fixture(scope="module")
def graph(spark):
    # deterministic preferential-attachment-ish graph + a 3-cycle +
    # dangling targets + zero-out-degree nodes
    nodes = [f"d{i}" for i in range(60)]
    edges = []
    for i in range(60):
        for j in range(1, 4):
            t = (i * 7 + j * 11) % 60
            if t != i:
                edges.append((f"d{i}", f"d{t}"))
    edges += [("d0", "d1"), ("d1", "d2"), ("d2", "d0")]
    edges += [("d5", "missing_x"), ("missing_y", "d6")]  # dangling, dropped
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id string")
    edf = spark.createDataFrame(edges, "src string, dst string")
    return nodes, edges, ndf, edf


def test_pagerank_matches_oracle(spark, graph):
    nodes, edges, ndf, edf = graph
    cfg = EngineConfig(pagerank_threshold=1.3e-5)
    resolved = resolve_edges(edf, ndf)
    assert resolved.count() == len(edges) - 2  # dangling pair dropped
    ranks = {r.doc_id: r.pagerank for r in pagerank(ndf, resolved, cfg).collect()}
    exp = py_pagerank(edges, set(nodes), threshold=cfg.pagerank_threshold)
    assert set(ranks) == set(exp)
    for d in nodes:
        assert abs(ranks[d] - exp[d]) < 1e-7, d


def test_attach_pagerank(spark, graph):
    nodes, edges, ndf, edf = graph
    cfg = EngineConfig()
    ranks = pagerank(ndf, resolve_edges(edf, ndf), cfg)
    docs = ndf.withColumn("pagerank", ndf.doc_id.isNotNull().cast("double") * 0.0)
    out = attach_pagerank(docs, ranks)
    assert out.count() == len(nodes)
    assert out.filter("pagerank > 0").count() > 0
