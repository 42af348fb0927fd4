"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Headline metric = total wall time of the query set.  The ``queries`` dict
additionally reports the index-build throughput (``build_docs_per_sec``)
and per-query latencies, which BASELINE.md tracks against the reference's
single-thread build numbers.

``--scaling`` mode runs the index build + query set at two parallelism
levels (local[8] vs local[32], the sandbox stand-in for N vs 4N
executors) and reports throughput at both plus scaling efficiency — the
BASELINE.json north_rule evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_suite(parallelism: int, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    from information_retrieval_system_spark import entry_queries as EQ
    from information_retrieval_system_spark.analysis.analyzer import analyze_query_terms
    from information_retrieval_system_spark.config import EngineConfig
    from information_retrieval_system_spark.index.builder import build_index
    from information_retrieval_system_spark.query import scoring
    from information_retrieval_system_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(f"bench-{parallelism}", parallelism=parallelism,
                      shuffle_partitions=max(parallelism, 8))
    timings: dict[str, float] = {}

    # --- index build (full config: stopwords + Porter) ---------------
    cfg = EngineConfig()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    t0 = time.perf_counter()
    index = build_index(docs, cfg, doc_col="doc_id", text_col="text")
    # force full materialization of every index table
    index.postings.count()
    index.docs.count()
    index.terms.count()
    build_s = time.perf_counter() - t0
    timings["index_build"] = round(build_s, 4)
    timings["build_docs_per_sec"] = round(n_docs / build_s, 2)

    # --- query latencies ----------------------------------------------
    for qname, qtext in [("q_bm25", "spark join merge"),
                         ("q_bm25_rare", "vector stream window"),
                         ("q_vsm", "spark join merge")]:
        t0 = time.perf_counter()
        qt = analyze_query_terms(spark, qtext, cfg)
        model = "VSM" if qname == "q_vsm" else "BM25"
        scoring.search(index, qt, k=20, cfg=cfg, model=model).collect()
        timings[qname] = round(time.perf_counter() - t0, 4)

    # --- gradeable registry queries -----------------------------------
    for name in ["term_df", "bm25_topk", "vsm_topk", "pricing_summary",
                 "top_customers", "events_running"]:
        fn = EQ.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    EQ._index_cache.clear()
    total = sum(v for k, v in timings.items() if k != "build_docs_per_sec")
    return {"timings": timings, "total": round(total, 4), "n_docs": n_docs}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        r_lo = run_suite(lo, sf_dir)
        r_hi = run_suite(hi, sf_dir)
        thr_lo = r_lo["timings"]["build_docs_per_sec"]
        thr_hi = r_hi["timings"]["build_docs_per_sec"]
        eff = thr_hi / (thr_lo * (hi / lo))
        print(json.dumps({
            "metric": "scaling",
            "parallelism": {"N": lo, "4N": hi},
            "build_docs_per_sec": {"N": thr_lo, "4N": thr_hi},
            "total_sec": {"N": r_lo["total"], "4N": r_hi["total"]},
            "scaling_efficiency": round(eff, 4),
            "sf": sf,
        }))
        return

    res = run_suite(cpus, sf_dir)
    print(json.dumps({
        "metric": "index-build + query suite wall time",
        "value": res["total"],
        "unit": "sec",
        "queries": res["timings"],
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
