"""Measure exact-join BM25 vs block-max WAND top-k latency on an
expanded corpus — the evidence for when the pruned path pays off.

Usage: python tools/wand_crossover.py [factor] [parallelism]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from information_retrieval_system_spark.analysis.analyzer import analyze_query_terms
from information_retrieval_system_spark.config import EngineConfig
from information_retrieval_system_spark.index.builder import build_index
from information_retrieval_system_spark.index.compression import (
    build_block_postings,
    build_dl_blocks,
)
from information_retrieval_system_spark.query import scoring
from information_retrieval_system_spark.query.wand import bm25_topk_wand
from information_retrieval_system_spark.session import get_spark
from information_retrieval_system_spark.sources.corpus import expand_documents


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    par = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("wand-crossover", parallelism=par, shuffle_partitions=64)
    cfg = EngineConfig()
    docs = expand_documents(
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet"), factor
    ).cache()
    n = docs.count()
    ix = build_index(docs, cfg, doc_col="doc_id", text_col="text", with_positions=False)
    ix.postings.count(); ix.docs.count(); ix.terms.count()
    blocks = build_block_postings(ix.postings).cache()
    dlb = build_dl_blocks(ix.docs).cache()
    blocks.count(); dlb.count()

    queries = ["spark join merge", "vector stream window", "batch group hash"]
    out = {"n_docs": n, "parallelism": par, "queries": {}}
    for q in queries:
        qt = analyze_query_terms(spark, q, cfg)
        terms = [r.term for r in qt.collect()]
        # warm both paths once, then measure
        scoring.bm25_search(ix, qt, k=20, cfg=cfg).collect()
        bm25_topk_wand(blocks, dlb, ix.terms, ix.stats, terms, k=20, cfg=cfg).collect()
        t0 = time.perf_counter()
        exact = scoring.bm25_search(ix, qt, k=20, cfg=cfg).collect()
        t_exact = time.perf_counter() - t0
        t0 = time.perf_counter()
        wand = bm25_topk_wand(blocks, dlb, ix.terms, ix.stats, terms, k=20, cfg=cfg,
                              docs=ix.docs).collect()
        t_wand = time.perf_counter() - t0
        same = [r.doc_id for r in wand] == [r.doc_id for r in exact]
        out["queries"][q] = {"exact_sec": round(t_exact, 3),
                             "wand_sec": round(t_wand, 3),
                             "identical_topk": same}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
