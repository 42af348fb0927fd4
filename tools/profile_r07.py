"""Round-7 optimization profiling harness (NOT the frozen bench).

Phases:
  --build   : instrument build_index action-by-action at sf0.1 (bench cfg)
  --suite   : time each suite query with Spark job counts
  --curation: stage-timed curation funnel at SPARK_GRAFT_ZIPF_DOCS docs
  --zbuild  : zipf no-stem build timing (the zipf_build metric)

Prints one JSON line per phase.  Use `noop` sinks for isolation where the
frozen bench uses .collect()/.count() so numbers here are comparable to
bench.py's methodology (same actions), not idealized.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def njobs(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()


def tick(spark, out, name, t0, j0):
    out[name] = {"sec": round(time.perf_counter() - t0, 3),
                 "jobs": njobs(spark) - j0}
    return time.perf_counter(), njobs(spark)


def profile_build(spark, sf_dir):
    """Copy of build_index (stemmed path, bench cfg) with per-action timers."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from information_retrieval_system_spark import entry_queries as EQ
    from information_retrieval_system_spark.analysis.analyzer import (
        porter_stem_udf, stopword_filter_condition, tokens_array_expr)
    from information_retrieval_system_spark.config import EngineConfig
    from information_retrieval_system_spark.index.builder import assign_dense_ids

    cfg = EngineConfig()
    out = {}
    docs = EQ.load_documents(spark, sf_dir)
    n_docs_pre = docs.count()  # matches bench warm-up
    t0, j0 = time.perf_counter(), njobs(spark)

    slim = docs.select(F.col("doc_id").alias("doc_id"), F.col("text").alias("content"))
    docs_base = slim.withColumn("doc_int", F.col("doc_id").cast("long"))
    pre = docs_base.select(
        "doc_id", "doc_int", tokens_array_expr(F.col("content")).alias("_arr")
    ).persist(StorageLevel.DISK_ONLY)
    docs_slim = pre.select("doc_id", "doc_int", F.size("_arr").alias("length")).cache()
    tokens = pre.select("doc_id", "doc_int", F.posexplode("_arr").alias("pos", "token"))
    tokens = tokens.filter(stopword_filter_condition(F.col("token")))

    vocab = tokens.select("token").distinct().withColumn("term", porter_stem_udf("token"))
    vocab = vocab.persist(StorageLevel.MEMORY_ONLY)
    vocab.count()
    t0, j0 = tick(spark, out, "vocab_distinct_stem", t0, j0)

    term_dict = assign_dense_ids(vocab.select("term").distinct(), "term", "term_id").cache()
    term_dict.count()
    t0, j0 = tick(spark, out, "assign_dense_ids_terms", t0, j0)

    tok2id = vocab.join(F.broadcast(term_dict), "term").select("token", "term_id")
    import math
    agg1 = [F.count("*").cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions")]
    postings = (
        tokens.join(F.broadcast(tok2id), "token", "inner")
        .groupBy("term_id", "doc_id", "doc_int")
        .agg(*agg1)
        .join(F.broadcast(term_dict), "term_id")
    ).cache()
    tstats = postings.groupBy("term_id").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf")).cache()
    terms = tstats.join(F.broadcast(term_dict), "term_id").select("term", "df", "cf").cache()

    r = docs_slim.agg(F.count("*").alias("n_docs"), F.sum("length").alias("total_len")).collect()[0]
    n_docs, total_len = int(r["n_docs"]), int(r["total_len"] or 0)
    t0, j0 = tick(spark, out, "doc_stats_agg(materializes pre+docs_slim)", t0, j0)

    n_postings = int(terms.agg(F.sum("df")).collect()[0][0] or 0)
    t0, j0 = tick(spark, out, "n_postings_agg(materializes postings+terms)", t0, j0)

    log2 = math.log(2.0)
    norm_df = (
        postings.join(F.broadcast(tstats.select("term_id", "df")), "term_id")
        .withColumn("w", F.col("tf") * F.log(F.floor(F.lit(n_docs + 1) / F.col("df")).cast("double")) / F.lit(log2))
        .groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("norm"))
    )
    docs_out = (
        docs_slim.join(norm_df, "doc_id", "left")
        .withColumn("norm", F.coalesce(F.col("norm"), F.lit(0.0)))
        .withColumn("pagerank", F.lit(0.0))
    ).cache()

    postings.count()
    t0, j0 = tick(spark, out, "postings_count(cached)", t0, j0)
    docs_out.count()
    t0, j0 = tick(spark, out, "docs_count(norms)", t0, j0)
    terms.count()
    t0, j0 = tick(spark, out, "terms_count(cached)", t0, j0)
    out["n_docs"] = n_docs
    out["n_postings"] = n_postings
    return out


def profile_suite(spark, sf_dir):
    from information_retrieval_system_spark import entry_queries as EQ
    from information_retrieval_system_spark.analysis.analyzer import analyze_query_terms
    from information_retrieval_system_spark.config import EngineConfig
    from information_retrieval_system_spark.index.builder import build_index
    from information_retrieval_system_spark.query import scoring

    out = {}
    cfg = EngineConfig()
    docs = EQ.load_documents(spark, sf_dir)
    docs.count()
    t0, j0 = time.perf_counter(), njobs(spark)
    index = build_index(docs, cfg, doc_col="doc_id", text_col="text")
    index.postings.count(); index.docs.count(); index.terms.count()
    t0, j0 = tick(spark, out, "index_build", t0, j0)

    for qname, qtext in [("q_bm25", "spark join merge"),
                         ("q_bm25_rare", "vector stream window"),
                         ("q_vsm", "spark join merge")]:
        qt = analyze_query_terms(spark, qtext, cfg)
        model = "VSM" if qname == "q_vsm" else "BM25"
        scoring.search(index, qt, k=20, cfg=cfg, model=model).collect()
        t0, j0 = tick(spark, out, qname, t0, j0)

    for name in ["term_df", "bm25_topk", "vsm_topk", "wand_topk",
                 "batch_bm25", "minhash_signatures", "cosine_topk",
                 "pricing_summary", "top_customers", "events_running"]:
        fn = EQ.QUERIES[name]
        fn(spark, sf_dir).collect()
        t0, j0 = tick(spark, out, name, t0, j0)

    import tempfile

    from information_retrieval_system_spark.index.trigram import (
        batch_substring_search, read_gram_df, read_trigram_index, regex_search,
        substring_search, trigram_postings, write_trigram_index)

    tri_out = os.path.join(tempfile.gettempdir(), f"prof_trigram_{os.getpid()}")
    write_trigram_index(trigram_postings(docs, "text", "doc_id"), tri_out, gram_buckets=16)
    t0, j0 = tick(spark, out, "trigram_build_write", t0, j0)
    posts = read_trigram_index(spark, tri_out)
    gdf = read_gram_df(spark, tri_out)
    substring_search(posts, docs, "spark join", "text", "doc_id",
                     gram_buckets=16, gram_df=gdf).count()
    t0, j0 = tick(spark, out, "trigram_substring", t0, j0)
    regex_search(posts, docs, "spark [a-z]+ join", "text", "doc_id",
                 gram_buckets=16, gram_df=gdf).count()
    t0, j0 = tick(spark, out, "trigram_regex", t0, j0)
    batch_substring_search(
        posts, docs, {1: "spark join", 2: "merge window", 3: "zzz never", 4: "stream batch"},
        "text", "doc_id", gram_buckets=16, gram_df=gdf).count()
    t0, j0 = tick(spark, out, "trigram_batch4", t0, j0)
    EQ._index_cache.clear()
    return out


def profile_curation(spark, n_docs):
    from pyspark.sql import functions as F

    from information_retrieval_system_spark.sources.zipf import zipf_corpus
    from information_retrieval_system_spark.textops import dedup, quality
    from information_retrieval_system_spark.textops.stats import (
        hash_split, quality_stratified_sample)

    out = {}
    corpus = zipf_corpus(spark, n_docs, vocab=n_docs // 10).cache()
    corpus.count()
    t0, j0 = time.perf_counter(), njobs(spark)
    scored = quality.quality_score(corpus, "text", "doc_id").select("id", "score")
    sh = dedup.shingle_table(corpus, "text", "doc_id", 3).localCheckpoint(eager=True)
    t0, j0 = tick(spark, out, "shingle_checkpoint", t0, j0)
    sigs = dedup.minhash_signatures(corpus, "text", "doc_id", 3, 8, 42, shingles=sh)
    cand = dedup.lsh_candidate_pairs(sigs, 4, 2, 200)
    cand = cand.localCheckpoint(eager=True)
    t0, j0 = tick(spark, out, "signatures+band_candidates", t0, j0)
    pairs = dedup.jaccard_for_candidate_pairs(cand, sh, 0.5, 100)
    pairs = pairs.select("id_a", "id_b")
    comp = dedup.connected_components(pairs)
    t0, j0 = tick(spark, out, "verify+components", t0, j0)
    losers = comp.filter("id != component").select("id")
    kept = scored.filter("score >= 0.5").join(losers, "id", "left_anti")
    sampled = quality_stratified_sample(kept, {0: 0.02, 1: 0.10, 2: 0.25, 3: 0.50, 4: 1.0})
    outd = hash_split(sampled, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    survivors = outd.groupBy("split").count().collect()
    t0, j0 = tick(spark, out, "quality+sample+split", t0, j0)
    out["survivors"] = int(sum(r["count"] for r in survivors))
    corpus.unpersist()
    return out


def profile_zbuild(spark, n_docs):
    from information_retrieval_system_spark.config import EngineConfig
    from information_retrieval_system_spark.index.builder import build_index
    from information_retrieval_system_spark.sources.zipf import zipf_corpus

    cfg = EngineConfig(use_stopwords=False, use_stemmer=False)
    out = {}
    corpus = zipf_corpus(spark, n_docs, vocab=n_docs // 10).cache()
    corpus.count()
    t0, j0 = time.perf_counter(), njobs(spark)
    ix = build_index(corpus, cfg, doc_col="doc_id", text_col="text", with_positions=False)
    ix.postings.count()
    t0, j0 = tick(spark, out, "zbuild_postings", t0, j0)
    ix.docs.count()
    t0, j0 = tick(spark, out, "zbuild_docs", t0, j0)
    ix.terms.count()
    t0, j0 = tick(spark, out, "zbuild_terms", t0, j0)
    corpus.unpersist()
    return out


def main():
    from information_retrieval_system_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile-r07", parallelism=cpus, shuffle_partitions=max(cpus, 8))
    res = {}
    if "--build" in sys.argv:
        res["build"] = profile_build(spark, sf_dir)
    if "--suite" in sys.argv:
        res["suite"] = profile_suite(spark, sf_dir)
    if "--curation" in sys.argv:
        nd = int(os.environ.get("SPARK_GRAFT_ZIPF_DOCS", "600000"))
        res["curation"] = profile_curation(spark, nd)
    if "--zbuild" in sys.argv:
        nd = int(os.environ.get("SPARK_GRAFT_ZIPF_DOCS", "600000"))
        res["zbuild"] = profile_zbuild(spark, nd)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
