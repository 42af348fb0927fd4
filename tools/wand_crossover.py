"""Measure exact-join BM25 vs block-max WAND top-k latency — the
evidence for when the pruned path pays off.

Two modes:

- default: the driver testdata expanded N× (31-term vocabulary — the
  regime where WAND CANNOT win, kept as the honest negative control).
- ``--zipf [n_docs] [vocab] [parallelism]``: deterministic Zipf corpus
  (sources/zipf.py — realistic term distribution, selective tails),
  BOTH paths served from their persisted layouts with term-bucket
  partition pruning: exhaustive reads the bucketed postings parquet and
  joins docs for dl; WAND reads the compressed block layout (dl blocks
  aligned, no docs join).  This is WAND's regime and the fair
  serving-vs-serving comparison.

Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
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

def zipf_query_ranks(vocab: int) -> list[tuple[int, int, int]]:
    """Query shapes as vocabulary ranks, scaled to the vocabulary size:
    a head/mid-frequency term + selective tail terms — the ad-hoc query
    profile WAND targets."""
    return [
        (3, vocab // 10, vocab // 3),
        (10, vocab // 4, 3 * vocab // 4),
        (100, vocab // 16, 5 * vocab // 6),
    ]


def run_zipf_crossover(spark, n_docs: int, vocab: int, block_span: int = 4096,
                       term_buckets: int = 64, reps: int = 3, k: int = 20,
                       work_dir: str | None = None) -> dict:
    """Build the Zipf corpus + both persisted layouts, then time
    exhaustive-served vs WAND-served per query (min over reps).
    Returns the result dict (also used by bench.py)."""
    import os

    from pyspark.sql import functions as F

    from information_retrieval_system_spark.index.builder import (
        IndexTables, read_index, write_index)
    from information_retrieval_system_spark.index.compression import (
        read_block_index, term_buckets_for, write_block_index)
    from information_retrieval_system_spark.sources.zipf import rank_token, zipf_corpus

    cfg = EngineConfig(use_stopwords=False, use_stemmer=False)
    base = work_dir or os.path.join(tempfile.gettempdir(), f"zipf_wand_{n_docs}")
    ix_dir, bl_dir = base + "_ix", base + "_blocks"
    out: dict = {"n_docs": n_docs, "vocab": vocab, "block_span": block_span}

    # stage boundaries are PINNED by forcing materialization inside each
    # timer: build_sec ends only after every index table is realized, so
    # internal laziness changes can never shift work between the build
    # and write columns again (r2->r3: removing an eager barrier inside
    # build_index moved the first postings materialization into
    # encode_write_sec, which read as a 2x "regression")
    t0 = time.perf_counter()
    corpus = zipf_corpus(spark, n_docs, vocab=vocab).cache()
    corpus.count()
    ix = build_index(corpus, cfg, doc_col="doc_id", text_col="text", with_positions=False)
    ix.postings.count(); ix.docs.count(); ix.terms.count()
    out["build_sec"] = round(time.perf_counter() - t0, 2)

    # plain-layout write (bucketed postings parquet), min over reps —
    # the same interleaved-min methodology the scaling bench uses, so
    # host drift can't masquerade as a code regression
    t_ixw = float("inf")
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        shutil.rmtree(ix_dir, ignore_errors=True)
        write_index(ix, ix_dir, cfg)
        t_ixw = min(t_ixw, time.perf_counter() - t0)
    out["index_write_sec"] = round(t_ixw, 2)
    corpus.unpersist()
    spark.catalog.clearCache()

    # compressed-block encode + serving write, fed from the WRITTEN
    # postings table (the production shape: the encoder is a separate
    # job reading the postings table, not a continuation of the build
    # lineage), min over reps
    served_postings = spark.read.parquet(os.path.join(ix_dir, "postings")).drop("bucket")
    served_docs = spark.read.parquet(os.path.join(ix_dir, "docs"))
    t_enc = float("inf")
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        blocks = build_block_postings(served_postings, block_span=block_span)
        dlb = build_dl_blocks(served_docs, block_span=block_span)
        shutil.rmtree(bl_dir, ignore_errors=True)
        write_block_index(blocks, dlb, bl_dir, term_buckets=term_buckets)
        t_enc = min(t_enc, time.perf_counter() - t0)
    out["encode_write_sec"] = round(t_enc, 2)
    n_postings = ix.stats.get("n_postings") or 0
    if t_enc > 0 and n_postings:
        out["encode_postings_per_sec"] = round(n_postings / t_enc, 1)

    six = read_index(spark, ix_dir)
    six.terms.cache().count()
    six.docs.cache().count()

    def exhaustive(Q, qt):
        bs = term_buckets_for(spark, Q, cfg.term_buckets)
        p = (six.postings.filter(F.col("bucket").isin(bs))
             .filter(F.col("term").isin(Q)).drop("bucket"))
        ixq = IndexTables(postings=p, docs=six.docs, terms=six.terms, stats=six.stats)
        return scoring.bm25_search(ixq, qt, k=k, cfg=cfg).collect()

    # integer doc ids (stats flag): doc_int == doc_id, so WAND skips the
    # final mapping join — the compressed layout's one denormalization gap
    wand_docs = None if six.stats.get("int_doc_ids") else six.docs
    # list the layout ONCE (symmetric with six.postings on the exhaustive
    # side); per-query pruning (tbucket partition filter + dl semi-join)
    # happens inside bm25_topk_wand — one driver job per query, not two
    b_all, dlb_served = read_block_index(spark, bl_dir, keep_bucket=True)

    def wand(Q):
        out = bm25_topk_wand(b_all, dlb_served, six.terms, six.stats, Q, k=k, cfg=cfg,
                             block_span=block_span, docs=wand_docs,
                             term_buckets=term_buckets)
        if wand_docs is None:
            out = out.select(F.col("doc_int").alias("doc_id"), "doc_int", "score")
        return out.collect()

    out["queries"] = {}
    for ranks in zipf_query_ranks(vocab):
        Q = [rank_token(r) for r in ranks]
        qt = spark.createDataFrame([(t, 1.0) for t in Q], "term string, qtf double")
        exhaustive(Q, qt); wand(Q)  # warm both paths (JIT, python pool)
        t_ex = t_wd = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); ex = exhaustive(Q, qt); t_ex = min(t_ex, time.perf_counter() - t0)
            t0 = time.perf_counter(); wd = wand(Q); t_wd = min(t_wd, time.perf_counter() - t0)
        same = ([(r.doc_id, round(r.score, 6)) for r in ex]
                == [(r.doc_id, round(r.score, 6)) for r in wd])
        out["queries"]["+".join(map(str, ranks))] = {
            "exhaustive_sec": round(t_ex, 3),
            "wand_sec": round(t_wd, 3),
            "speedup": round(t_ex / t_wd, 2) if t_wd > 0 else None,
            "identical_topk": same,
        }
    six.terms.unpersist(); six.docs.unpersist()
    return out


def main_zipf() -> None:
    args = [a for a in sys.argv[2:] if not a.startswith("-")]
    n_docs = int(args[0]) if len(args) > 0 else 2_000_000
    vocab = int(args[1]) if len(args) > 1 else 200_000
    par = int(args[2]) if len(args) > 2 else 16
    spark = get_spark("wand-zipf", parallelism=par, shuffle_partitions=64)
    out = run_zipf_crossover(spark, n_docs, vocab)
    out["parallelism"] = par
    print(json.dumps(out))


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
    if "--zipf" in sys.argv:
        main_zipf()
    else:
        main()
