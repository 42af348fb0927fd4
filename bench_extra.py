"""Round-7 auxiliary benchmarks (NOT the frozen driver bench).

Evidence harnesses cited by OPTIMIZATION_r07.md — each prints one JSON
line.  Modes:

  --append   : trigram delta-append maintenance cost vs the full-index
               re-aggregation it replaced (verdict weak item #1)
  --noop     : noop-sink isolation (guide §1.4) for the flagship
               suite queries at sf0.1
  --shingle  : old-vs-new shingles_expr A/B at SPARK_GRAFT_ZIPF_DOCS
               docs (interleaved, min over reps)

Usage: python bench_extra.py --append [--noop ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_append(spark, sf_dir: str) -> dict:
    """Append a 1/denom delta to a trigram layout: new merge-sum path vs the
    old full-postings re-aggregation (timed as its own job here so both
    costs come from the same session/window)."""
    from pyspark.sql import functions as F

    from information_retrieval_system_spark import entry_queries as EQ
    from information_retrieval_system_spark.index.trigram import (
        append_trigram_delta, trigram_postings, write_trigram_index)
    from information_retrieval_system_spark.sources.corpus import expand_documents

    factor = int(os.environ.get("SPARK_GRAFT_APPEND_FACTOR", "20"))
    denom = int(os.environ.get("SPARK_GRAFT_APPEND_DENOM", "10"))  # delta = 1/denom
    docs = expand_documents(EQ.load_documents(spark, sf_dir), factor).cache()
    n = docs.count()
    base = docs.filter(F.col("doc_id") % denom != 0)
    delta = docs.filter(F.col("doc_id") % denom == 0)
    out = os.path.join(tempfile.gettempdir(), f"bench_extra_tri_{os.getpid()}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    write_trigram_index(trigram_postings(base, "text", "doc_id"), out,
                        gram_buckets=16)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    append_trigram_delta(delta, out, "text", "doc_id", gram_buckets=16)
    append_s = time.perf_counter() - t0

    # isolate the gramdf REFRESH (the part the r7 fix changed) from the
    # unavoidable delta-postings write: old = full-postings
    # re-aggregation (cost grows with INDEX size), new = delta agg +
    # vocab-sized merge (cost grows with DELTA+VOCAB only).  Min over
    # reps; the trend across SPARK_GRAFT_APPEND_FACTOR values is the
    # evidence — at sandbox sizes a full parquet scan is sub-second, so
    # only the growth rate, not the tiny ratio, transfers to 100 TB.
    written = spark.read.parquet(os.path.join(out, "postings"))
    old_agg = written.groupBy("gram", "gbucket").agg(
        F.count("*").cast("long").alias("df"))
    t_old = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        old_agg.write.format("noop").mode("overwrite").save()
        t_old = min(t_old, time.perf_counter() - t0)
    delta_agg = (trigram_postings(delta, "text", "doc_id")
                 .withColumn("gbucket", F.pmod(F.hash("gram"), F.lit(16)))
                 .groupBy("gram", "gbucket")
                 .agg(F.count("*").cast("long").alias("df")))
    old_gramdf = spark.read.parquet(os.path.join(out, "gramdf")) \
        .select("gram", "gbucket", "df")
    merge_agg = (old_gramdf.unionByName(delta_agg)
                 .groupBy("gram", "gbucket")
                 .agg(F.sum("df").cast("long").alias("df")))
    t_new = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        merge_agg.write.format("noop").mode("overwrite").save()
        t_new = min(t_new, time.perf_counter() - t0)
    docs.unpersist()
    shutil.rmtree(out, ignore_errors=True)
    return {
        "n_docs": n,
        "base_build_write_sec": round(build_s, 3),
        "append_delta_total_sec": round(append_s, 3),
        "gramdf_refresh_old_full_rescan_sec": round(t_old, 3),
        "gramdf_refresh_new_delta_merge_sec": round(t_new, 3),
        "append_vs_base_build": round(append_s / build_s, 3) if build_s else None,
    }


def bench_noop(spark, sf_dir: str) -> dict:
    """guide §1.4: time the computation of the flagship registry queries
    into the noop sink (no collect, no driver transfer)."""
    from information_retrieval_system_spark import entry_queries as EQ

    out = {}
    for name in ["term_df", "bm25_topk", "vsm_topk", "batch_bm25",
                 "minhash_signatures", "cosine_topk"]:
        fn = EQ.QUERIES[name]
        spark.sparkContext.setJobDescription(f"noop:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    EQ._index_cache.clear()
    return out


def bench_shingle(spark, n_docs: int) -> dict:
    """Interleaved A/B: previous transform+slice+concat_ws shingles vs
    the current zip_with chain (both explode+count, min over reps)."""
    from pyspark.sql import functions as F

    from information_retrieval_system_spark.analysis.analyzer import tokens_array_expr
    from information_retrieval_system_spark.sources.zipf import zipf_corpus
    from information_retrieval_system_spark.textops.dedup import shingles_expr

    n = 3

    def old_expr(col):
        toks = tokens_array_expr(col)
        return F.when(F.size(toks) < n, F.array()).otherwise(
            F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))

    z = zipf_corpus(spark, n_docs, vocab=n_docs // 10).cache()
    z.count()

    def run(expr_fn):
        (z.select(F.explode(expr_fn(F.col("text"))).alias("s"))
         .selectExpr("count(s) c").write.format("noop").mode("overwrite").save())

    run(old_expr); run(lambda c: shingles_expr(c, n))  # warm
    t_old = t_new = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); run(old_expr); t_old = min(t_old, time.perf_counter() - t0)
        t0 = time.perf_counter(); run(lambda c: shingles_expr(c, n)); t_new = min(t_new, time.perf_counter() - t0)
    same = z.select(
        F.sum((old_expr(F.col("text")) != shingles_expr(F.col("text"), n)).cast("int")).alias("d")
    ).collect()[0]["d"]
    z.unpersist()
    return {"n_docs": n_docs, "old_sec": round(t_old, 3),
            "new_sec": round(t_new, 3),
            "speedup": round(t_old / t_new, 2) if t_new else None,
            "mismatching_docs": int(same or 0)}


def main() -> None:
    from information_retrieval_system_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", parallelism=cpus,
                      shuffle_partitions=max(cpus, 8))
    res: dict = {}
    if "--append" in sys.argv:
        res["trigram_append"] = bench_append(spark, sf_dir)
    if "--noop" in sys.argv:
        res["noop"] = bench_noop(spark, sf_dir)
    if "--shingle" in sys.argv:
        nd = int(os.environ.get("SPARK_GRAFT_ZIPF_DOCS", "600000"))
        res["shingle_ab"] = bench_shingle(spark, nd)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
