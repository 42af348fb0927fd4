"""Resumable index build with per-bucket checkpoints, lineage + metrics.

The reference's resumability story is its partial-index files: a crashed
build keeps the dumped partials (Indexer.java:638-659).  Our unit of
resume is the TERM BUCKET (hash(term) % term_buckets): each bucket's
postings partition is written independently and recorded in
``manifest.json`` with row counts, wall time and postings/sec.  A
restarted build:

1. validates the input fingerprint (doc count + xxhash64 aggregate over
   (doc_id, content) pairs) against the manifest — a changed corpus,
   including same-id re-crawls with edited texts, invalidates everything;
2. skips stages/buckets already marked done;
3. re-runs only missing buckets — deterministic doc_int assignment
   (row_number over doc key) guarantees the re-run produces byte-identical
   postings for the remaining buckets.

At cluster scale each bucket write is an independent Spark job over a
cached intermediate; on Iceberg this maps to one append snapshot per
bucket with the manifest as a small metadata table.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from .builder import IndexTables, build_index, term_bucket_expr


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.json")


def _load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"fingerprint": None, "stages": {}, "buckets_done": [], "metrics": {}}


def _save_manifest(out_dir: str, m: dict) -> None:
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2)
    os.replace(tmp, _manifest_path(out_dir))


def corpus_fingerprint(corpus: DataFrame, doc_col: str, text_col: str | None = None) -> dict:
    """Order-insensitive corpus fingerprint: doc count + xor-fold of
    xxhash64 over (doc_id, content).  Folding the CONTENT in matters: a
    re-crawl that keeps ids but edits texts must invalidate the manifest,
    or resume would mix old-content and new-content buckets."""
    cols = [F.col(doc_col).cast("string")]
    if text_col is not None:
        cols.append(F.col(text_col).cast("string"))
    row = corpus.agg(
        F.count("*").alias("n"),
        # xor-fold (order-insensitive, overflow-free under ANSI mode)
        F.bit_xor(F.xxhash64(*cols)).alias("h"),
    ).collect()[0]
    return {"n": int(row["n"]), "h": int(row["h"] or 0)}


class ResumableIndexBuild:
    """Kill-safe index build: ``run()`` is idempotent and restartable."""

    def __init__(
        self,
        corpus: DataFrame,
        out_dir: str,
        cfg: EngineConfig = DEFAULT_CONFIG,
        doc_col: str = "doc_id",
        text_col: str = "content",
        fail_after_buckets: int | None = None,  # fault injection for tests
    ) -> None:
        self.corpus = corpus
        self.out_dir = out_dir
        self.cfg = cfg
        self.doc_col = doc_col
        self.text_col = text_col
        self.fail_after_buckets = fail_after_buckets

    def run(self) -> dict:
        os.makedirs(self.out_dir, exist_ok=True)
        m = _load_manifest(self.out_dir)
        fp = corpus_fingerprint(self.corpus, self.doc_col, self.text_col)
        if m["fingerprint"] is not None and m["fingerprint"] != fp:
            # corpus changed -> previous checkpoints are invalid
            shutil.rmtree(self.out_dir)
            os.makedirs(self.out_dir)
            m = _load_manifest(self.out_dir)
        m["fingerprint"] = fp
        _save_manifest(self.out_dir, m)

        tables = build_index(
            self.corpus, self.cfg, doc_col=self.doc_col, text_col=self.text_col
        )
        k = self.cfg.term_buckets
        bucketed = tables.postings.withColumn(
            "bucket", term_bucket_expr(F.col("term"), k)
        )

        # --- stage: docs ------------------------------------------------
        if not m["stages"].get("docs"):
            t0 = time.perf_counter()
            tables.docs.write.mode("overwrite").parquet(os.path.join(self.out_dir, "docs"))
            m["stages"]["docs"] = True
            m["metrics"]["docs_sec"] = round(time.perf_counter() - t0, 3)
            _save_manifest(self.out_dir, m)

        # --- stage: postings, one checkpoint per bucket -------------------
        done = set(m["buckets_done"])
        written = 0
        for b in range(k):
            if b in done:
                continue
            if self.fail_after_buckets is not None and written >= self.fail_after_buckets:
                raise RuntimeError(f"injected failure after {written} buckets")
            t0 = time.perf_counter()
            part = bucketed.filter(F.col("bucket") == b).drop("bucket")
            part.sortWithinPartitions("term", "doc_int").write.mode("overwrite").parquet(
                os.path.join(self.out_dir, "postings", f"bucket={b}")
            )
            dt = time.perf_counter() - t0
            n_rows = part.count()
            m["buckets_done"].append(b)
            m["metrics"][f"bucket_{b}"] = {
                "rows": n_rows,
                "sec": round(dt, 3),
                "postings_per_sec": round(n_rows / dt, 1) if dt > 0 else None,
            }
            _save_manifest(self.out_dir, m)
            written += 1

        # --- stage: skew observability -----------------------------------
        if not m["stages"].get("skew"):
            from .skew import skew_stats

            m["metrics"]["skew"] = skew_stats(tables.postings, tables.stats["n_docs"])
            m["stages"]["skew"] = True
            _save_manifest(self.out_dir, m)

        # --- stage: terms + stats ----------------------------------------
        if not m["stages"].get("terms"):
            tables.terms.write.mode("overwrite").parquet(os.path.join(self.out_dir, "terms"))
            m["stages"]["terms"] = True
            _save_manifest(self.out_dir, m)
        if not m["stages"].get("stats"):
            with open(os.path.join(self.out_dir, "stats.json"), "w") as f:
                json.dump(tables.stats, f, indent=2)
            m["stages"]["stats"] = True
            _save_manifest(self.out_dir, m)
        tables.postings.unpersist()
        return m


def read_checkpointed(spark: SparkSession, out_dir: str) -> IndexTables:
    postings = spark.read.option("basePath", os.path.join(out_dir, "postings")).parquet(
        os.path.join(out_dir, "postings", "bucket=*")
    )
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    terms = spark.read.parquet(os.path.join(out_dir, "terms"))
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    return IndexTables(postings=postings, docs=docs, terms=terms, stats=stats)
