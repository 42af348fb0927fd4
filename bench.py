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
levels (default local[4] vs local[16] — see run_scaling's docstring for
why not (8, 32) on this host; the sandbox stand-in for N vs 4N
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
    # load_documents spreads the single-file sandbox parquet across the
    # session's cores (one partition otherwise = single-threaded
    # tokenize); at scale the input is many files and this is a no-op
    docs = EQ.load_documents(spark, sf_dir)
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
    for name in ["term_df", "bm25_topk", "vsm_topk", "wand_topk",
                 "batch_bm25", "minhash_signatures", "cosine_topk",
                 "pricing_summary", "top_customers", "events_running"]:
        fn = EQ.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    # --- trigram code-search layout: build/write once, then serve ------
    import tempfile

    from information_retrieval_system_spark.index.trigram import (
        read_gram_df, read_trigram_index, regex_search, substring_search,
        trigram_postings, write_trigram_index)

    tri_out = os.path.join(tempfile.gettempdir(), f"bench_trigram_{os.getpid()}")
    t0 = time.perf_counter()
    write_trigram_index(trigram_postings(docs, "text", "doc_id"), tri_out,
                        gram_buckets=16)
    timings["trigram_build_write"] = round(time.perf_counter() - t0, 4)
    posts = read_trigram_index(spark, tri_out)
    gdf = read_gram_df(spark, tri_out)
    t0 = time.perf_counter()
    substring_search(posts, docs, "spark join", "text", "doc_id",
                     gram_buckets=16, gram_df=gdf).count()
    timings["trigram_substring"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    regex_search(posts, docs, "spark [a-z]+ join", "text", "doc_id",
                 gram_buckets=16, gram_df=gdf).count()
    timings["trigram_regex"] = round(time.perf_counter() - t0, 4)
    from information_retrieval_system_spark.index.trigram import batch_substring_search

    t0 = time.perf_counter()
    batch_substring_search(
        posts, docs,
        {1: "spark join", 2: "merge window", 3: "zzz never", 4: "stream batch"},
        "text", "doc_id", gram_buckets=16, gram_df=gdf).count()
    timings["trigram_batch4"] = round(time.perf_counter() - t0, 4)

    EQ._index_cache.clear()

    # --- WAND-vs-exhaustive on a realistic Zipf vocabulary -------------
    # (the testdata's 31-term vocabulary cannot show block-max pruning;
    # this is O5's regime: mid-frequency head term + selective tails,
    # both paths served from persisted bucket-pruned layouts)
    zipf_docs = int(os.environ.get("SPARK_GRAFT_ZIPF_DOCS", "600000"))
    zipf = {}
    if zipf_docs > 0:
        from tools.wand_crossover import run_zipf_crossover

        z = run_zipf_crossover(spark, zipf_docs, vocab=zipf_docs // 10,
                               reps=2)
        zipf["zipf_n_docs"] = zipf_docs
        zipf["zipf_build"] = z["build_sec"]
        # split since r4: index_write = plain bucketed layout,
        # encode_write = compressed-block encode + serving write (fed
        # from the written postings table), both min-over-reps — r3's
        # single cold number conflated them with build laziness
        zipf["zipf_index_write"] = z["index_write_sec"]
        zipf["zipf_encode_write"] = z["encode_write_sec"]
        if "encode_postings_per_sec" in z:
            zipf["zipf_encode_postings_per_sec"] = z["encode_postings_per_sec"]
        ex_tot = sum(q["exhaustive_sec"] for q in z["queries"].values())
        wd_tot = sum(q["wand_sec"] for q in z["queries"].values())
        zipf["zipf_q_exhaustive"] = round(ex_tot, 4)
        zipf["zipf_q_wand"] = round(wd_tot, 4)
        zipf["zipf_wand_speedup_overall"] = round(ex_tot / wd_tot, 3) if wd_tot else None
        # per-query-shape speedups: WAND's regime is the head-heavy query
        # (its speedup grows with corpus size); the all-rare query is
        # where exhaustive is already trivially cheap
        for name, q in z["queries"].items():
            zipf[f"zipf_speedup_{name}"] = q["speedup"]
        zipf["zipf_rank_identical"] = all(
            q["identical_topk"] for q in z["queries"].values()
        )
        # routed 635-query Run_B6 shape: ONE batched call vs the
        # per-query loop (measured head-to-head on a sample;
        # 635-scale loop cost extrapolated per-query, labelled _est)
        br = z.get("batch_routed")
        if br:
            zipf["batch_routed_635"] = br["batch_sec"]
            zipf["batch_routed_635_routes_wand"] = br["routes_wand"]
            zipf["batch_routed_635_routes_exhaustive"] = br["routes_exhaustive"]
            zipf["batch_routed_loop_sample_n"] = br["loop_sample_n"]
            zipf["batch_routed_loop_sample_sec"] = br["loop_sample_sec"]
            zipf["batch_routed_batch_sample_sec"] = br["batch_sample_sec"]
            zipf["batch_routed_speedup_sample_measured"] = br["speedup_sample_measured"]
            zipf["batch_routed_speedup635_est"] = br["speedup_635_est"]
            zipf["batch_routed_identical"] = br["loop_batch_identical"]
            # retrieval -> AP/nDCG eval composed over the same 635
            # routed queries (one plan: the reference's golden run)
            zipf["batch_eval_635_sec"] = br["eval_sec"]
            zipf["batch_eval_635_mean_ap"] = br["eval_mean_ap"]
            zipf["batch_eval_635_mean_ndcg"] = br["eval_mean_ndcg"]

        # --- composed training-mix curation funnel (quality gate ->
        # LSH near-dedup keep -> stratified sample -> split) over the
        # same 600k Zipf corpus: docs/sec through the WHOLE funnel
        from information_retrieval_system_spark.sources.zipf import zipf_corpus
        from information_retrieval_system_spark.textops import dedup, quality
        from information_retrieval_system_spark.textops.stats import (
            hash_split, quality_stratified_sample)

        corpus = zipf_corpus(spark, zipf_docs, vocab=zipf_docs // 10).cache()
        n_cur = corpus.count()
        t0 = time.perf_counter()
        scored = quality.quality_score(corpus, "text", "doc_id").select("id", "score")
        # tokenize+shingle is the funnel's dominant CPU and the plan
        # references the shingle table from the signature, df-cap, and
        # verify subtrees across multiple actions — materialize it ONCE
        # (eager local checkpoint) so every consumer reads rows instead
        # of re-tokenizing the corpus.  Funnel measured 1559 s -> 167 s
        # at 600k docs with this + the dedup-internal barriers.
        sh = dedup.shingle_table(corpus, "text", "doc_id", 3).localCheckpoint(
            eager=True)
        pairs = dedup.minhash_lsh_dedup(
            corpus, "text", "doc_id", n=3, num_hashes=8, bands=4,
            threshold=0.5, seed=42, max_shingle_df=100, max_bucket_size=200,
            shingles=sh)
        comp = dedup.connected_components(pairs.select("id_a", "id_b"))
        losers = comp.filter("id != component").select("id")
        kept = scored.filter("score >= 0.5").join(losers, "id", "left_anti")
        sampled = quality_stratified_sample(
            kept, {0: 0.02, 1: 0.10, 2: 0.25, 3: 0.50, 4: 1.0})
        out = hash_split(sampled, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
        survivors = out.groupBy("split").count().collect()
        cur_sec = time.perf_counter() - t0
        corpus.unpersist()
        zipf["curation_docs_per_sec"] = round(n_cur / cur_sec, 1)
        zipf["curation_sec"] = round(cur_sec, 3)
        zipf["curation_survivors"] = int(sum(r["count"] for r in survivors))

    # headline value = the sf-suite wall time (comparable across rounds);
    # the zipf crossover's one-time corpus build/encode is reported in the
    # queries dict but not folded into the suite total
    total = sum(v for k, v in timings.items() if k != "build_docs_per_sec")
    timings.update(zipf)
    return {"timings": timings, "total": round(total, 4), "n_docs": n_docs}


def run_scaling(sf_dir: str, sf: str) -> None:
    """North-rule evidence: same job at local[N] vs local[4N] cores.

    Default pair is (4, 16), NOT (8, 32): the sandbox's 32 advertised
    vCPUs deliver only ~18 cores of real throughput (a pure-CPU hash
    burn scales 8->32 workers at 0.57 efficiency but 4->16 at 0.91 —
    hypervisor overcommit), so (8, 32) measures the host's ceiling, not
    the engine.  Both levels of (4, 16) fit inside the delivered
    capacity; override with SPARK_GRAFT_SCALE_N.

    The sandbox testdata is tiny (5k docs at sf0.1), so fixed scheduler
    overhead would swamp any scaling signal; the corpus is therefore
    expanded DETERMINISTICALLY (sources.corpus.expand_documents — pure
    column exprs, no RNG) to a compute-bound size before measuring.
    """
    import time

    from pyspark.sql import SparkSession

    from information_retrieval_system_spark.analysis.analyzer import analyze_query_terms
    from information_retrieval_system_spark.config import EngineConfig
    from information_retrieval_system_spark.index.builder import build_index
    from information_retrieval_system_spark.query import scoring
    from information_retrieval_system_spark.session import get_spark
    from information_retrieval_system_spark.sources.corpus import expand_documents

    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "40"))
    # the sandbox host's delivered CPU drifts over minutes; reps are
    # INTERLEAVED across the two parallelism levels and the min per level
    # is reported, which cancels slow-host windows instead of letting
    # them land on one side of the comparison
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    results = {}

    def one_rep(par: int) -> tuple[int, float, float]:
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        # identical plan at both core counts: shuffle partitioning fixed
        spark = get_spark(f"scaling-{par}", parallelism=par, shuffle_partitions=64)
        cfg = EngineConfig()
        docs = expand_documents(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), factor
        ).cache()
        n_docs = docs.count()
        # warm-up build (JIT, codegen, arrow python pool) then measure:
        # cluster throughput questions are about steady state, not JVM
        # cold start, and each rep necessarily boots a fresh JVM
        warm = expand_documents(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), max(factor // 8, 1)
        )
        wix = build_index(warm, cfg, doc_col="doc_id", text_col="text",
                          with_positions=False)
        wix.postings.count(); wix.docs.count(); wix.terms.count()
        spark.catalog.clearCache()
        docs = docs.cache(); docs.count()
        t0 = time.perf_counter()
        index = build_index(docs, cfg, doc_col="doc_id", text_col="text",
                            with_positions=False)
        index.postings.count(); index.docs.count(); index.terms.count()
        build_s = time.perf_counter() - t0
        lat = []
        for qtext in ["spark join merge", "vector stream window", "batch group hash"]:
            t0 = time.perf_counter()
            qt = analyze_query_terms(spark, qtext, cfg)
            scoring.bm25_search(index, qt, k=20, cfg=cfg).collect()
            lat.append(time.perf_counter() - t0)
        docs.unpersist()
        return n_docs, build_s, sum(lat) / len(lat)

    n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
    n_hi = 4 * n_lo
    # host co-probes bracketing the measurement (same session): the
    # sha256 burn is cache-resident (sees only CPU delivery), the
    # STREAM triad is DRAM-resident (sees only the shared memory bus).
    # burn_eff ~1.0 + triad_eff << 1.0 + build_eff ~= triad_eff is the
    # DIRECT bandwidth attribution of the (4,16) residual — each real
    # 4N executor brings its own memory bus, so it doesn't transfer.
    from tools.host_probe import probe_pair

    probe_pre = probe_pair(n_lo)
    for _ in range(reps):
        for par in (n_lo, n_hi):
            n_docs, build_s, ql = one_rep(par)
            cur = results.setdefault(par, {"n_docs": n_docs,
                                           "build_sec": build_s,
                                           "query_latency_sec": ql})
            cur["build_sec"] = min(cur["build_sec"], build_s)
            cur["query_latency_sec"] = min(cur["query_latency_sec"], ql)
    for par, cur in results.items():
        cur["build_sec"] = round(cur["build_sec"], 3)
        cur["docs_per_sec"] = round(cur["n_docs"] / cur["build_sec"], 1)
        cur["query_latency_sec"] = round(cur["query_latency_sec"], 3)
    probe_post = probe_pair(n_lo)
    thr_lo, thr_hi = results[n_lo]["docs_per_sec"], results[n_hi]["docs_per_sec"]
    eff = thr_hi / (thr_lo * 4.0)
    print(json.dumps({
        "metric": "scaling",
        "parallelism": {"N": n_lo, "4N": n_hi},
        "N": results[n_lo],
        "4N": results[n_hi],
        "scaling_efficiency": round(eff, 4),
        "host_probe_pre": probe_pre,
        "host_probe_post": probe_post,
        "expand_factor": factor,
        "sf": sf,
    }))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if "--scaling" in sys.argv:
        run_scaling(sf_dir, sf)
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
