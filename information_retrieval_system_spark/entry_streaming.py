"""Gradeable query: the Structured-Streaming incremental index, gated
against the SAME DuckDB oracle as the batch path.

``stream_term_df`` feeds the documents table through the file-source
stream in several micro-batches (maxFilesPerTrigger), lets foreachBatch
append per-batch posting deltas, then aggregates the merged delta view
into (term, df, cf).  Because each doc arrives exactly once, the union
aggregation is batching-invariant — so the streaming result must be
value-identical to the batch ``term_df`` oracle.  This upgrades the
streaming path from a stream==batch pytest to a first-class driver gate.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import entry_queries as EQ
from .streaming.incremental import incremental_index_stream, merged_index_view

_DONE: dict[str, str] = {}


#: hard ceiling on the availableNow drain — a stalled stream must FAIL
#: the gate loudly, never hang the whole driver/correctness run
STREAM_TIMEOUT_SEC = 300


def _stream_out(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _DONE:
        # pid in the path: concurrent suite runs on the same sf_dir must
        # not share a checkpoint/output dir (overwrite under live readers)
        base = os.path.join(tempfile.gettempdir(), "irs_stream",
                            f"pid{os.getpid()}",
                            sf_dir.strip("/").replace("/", "_"))
        shutil.rmtree(base, ignore_errors=True)
        in_dir = os.path.join(base, "in")
        # land the corpus as several files so availableNow drains it in
        # multiple micro-batches (maxFilesPerTrigger=4)
        EQ.load_documents(spark, sf_dir).repartition(8).write.parquet(in_dir)
        q = incremental_index_stream(
            spark, in_dir,
            checkpoint_dir=os.path.join(base, "ckpt"),
            out_dir=os.path.join(base, "out"),
            cfg=EQ.NOSTEM_CFG,
        )
        try:
            finished = q.awaitTermination(STREAM_TIMEOUT_SEC)
        finally:
            q.stop()
        if not finished:
            raise RuntimeError(
                f"incremental index stream did not drain within "
                f"{STREAM_TIMEOUT_SEC}s (checkpoint: {base})"
            )
        _DONE[sf_dir] = os.path.join(base, "out")
    return _DONE[sf_dir]


def q_stream_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _stream_out(spark, sf_dir)
    _, _, terms, _ = merged_index_view(spark, out)
    return terms.select("term", F.col("df").cast("long").alias("df"),
                        F.col("cf").cast("long").alias("cf"))


_COMPACTED: dict[str, object] = {}


def _compacted_ix(spark: SparkSession, sf_dir: str):
    """Stream-ingest the corpus, then run the compaction job: deltas ->
    bucketed serving layout -> read back.  Cached per sf_dir."""
    if sf_dir not in _COMPACTED:
        from .streaming.incremental import compact_delta_index

        delta = _stream_out(spark, sf_dir)
        cdir = os.path.join(os.path.dirname(delta), "compacted")
        _COMPACTED[sf_dir] = compact_delta_index(spark, delta, cdir, EQ.NOSTEM_CFG)
    return _COMPACTED[sf_dir]


def q_compacted_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction round-trip must be value-invisible: term stats from
    the COMPACTED bucketed layout against the same batch oracle."""
    ix = _compacted_ix(spark, sf_dir)
    return ix.terms.select("term", F.col("df").cast("long").alias("df"),
                           F.col("cf").cast("long").alias("cf"))


def q_compacted_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: stream ingest -> compaction -> BM25 top-k SERVED FROM
    the compacted layout, against the batch BM25 oracle."""
    from .query import scoring

    ix = _compacted_ix(spark, sf_dir)
    res = scoring.bm25_search(ix, EQ.query_terms_df(spark), k=EQ.TOPK,
                              cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


def q_stream_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming WINDOWED AGGREGATION graded against the
    batch tumbling-window oracle: the events table replayed as a
    multi-file stream, 1-day window(ts) x event_type aggregation with
    the same exact-integer-cents arithmetic, availableNow drain.

    Output mode is ``complete`` into a memory sink so the final windows
    (which no watermark has passed when the stream drains) are included
    — a production deployment uses append + withWatermark into a real
    sink and accepts that open windows emit later.  Aggregation state
    is per (window, event_type): bounded, mergeable across batches."""
    def _project(tbl: DataFrame) -> DataFrame:
        return tbl.select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            (F.col("_c") / F.lit(100.0)).alias("sum_value"),
            (F.expr("sign(_c) * ((abs(_c) * 200 + n_events) div (2 * n_events))")
             / F.lit(10000.0)).alias("avg_value"),
        )

    cache_key = f"evtumbling:{sf_dir}"
    if cache_key in _DONE:
        return _project(spark.table(_DONE[cache_key]))
    base = os.path.join(tempfile.gettempdir(), "irs_stream_ev",
                        f"pid{os.getpid()}",
                        sf_dir.strip("/").replace("/", "_"))
    shutil.rmtree(base, ignore_errors=True)
    in_dir = os.path.join(base, "in")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "event_type", "value")
    ev.repartition(6).write.parquet(in_dir)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 2)
        .parquet(in_dir)
    )
    agg = (
        stream.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias("_c"),
        )
    )
    # unique sink per invocation: memory-sink query names are global to
    # the session, and a name collision kills the second start()
    sink = f"ev_tumbling_{os.getpid()}_{len(_DONE)}"
    q = (
        agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        finished = q.awaitTermination(STREAM_TIMEOUT_SEC)
    finally:
        q.stop()
    if not finished:
        raise RuntimeError("windowed-agg stream did not drain")
    _DONE[cache_key] = sink
    return _project(spark.table(sink))


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING exact dedup: the documents table replayed as a
    multi-file stream through ``dropDuplicates`` on the content hash
    (stateful — first arrival per key emits, later arrivals are
    swallowed by the dedup state), availableNow drain into an append
    memory sink.

    The gated output is the distinct content-hash SET, which is
    batching- and arrival-order-invariant, so it must equal the batch
    ``SELECT DISTINCT sha256(...)`` oracle exactly.  A production
    deployment bounds the state with ``dropDuplicatesWithinWatermark``
    (same plan shape + state TTL); the sandbox corpus has no event-time
    column on documents, so the unbounded form is gated."""
    cache_key = f"dedup:{sf_dir}"
    if cache_key in _DONE:
        return spark.table(_DONE[cache_key])
    base = os.path.join(tempfile.gettempdir(), "irs_stream_dd",
                        f"pid{os.getpid()}",
                        sf_dir.strip("/").replace("/", "_"))
    shutil.rmtree(base, ignore_errors=True)
    in_dir = os.path.join(base, "in")
    EQ.load_documents(spark, sf_dir).select("doc_id", "text").repartition(8) \
        .write.parquet(in_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 3)
        .parquet(in_dir)
    )
    dd = (
        stream.select(
            F.sha2(F.substring("text", 1, 120), 256).alias("content_sha"))
        .dropDuplicates(["content_sha"])
    )
    sink = f"stream_dd_{os.getpid()}_{len(_DONE)}"
    q = (
        dd.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        finished = q.awaitTermination(STREAM_TIMEOUT_SEC)
    finally:
        q.stop()
    if not finished:
        raise RuntimeError("streaming dedup did not drain")
    _DONE[cache_key] = sink
    return spark.table(sink)


SQL_STREAM_DEDUP = """
SELECT DISTINCT sha256(substr(text, 1, 120)) AS content_sha FROM documents
"""


_MERGED: dict[str, str] = {}

MERGE_SPLIT_DOC_ID = 250


def _merged_snapshot_root(spark: SparkSession, sf_dir: str) -> str:
    """The FULL index-update lifecycle, executed once per sf_dir:

    1. snapshot v1 = batch build over the docs with
       doc_id < MERGE_SPLIT_DOC_ID (the corpus as first crawled);
    2. the REMAINING docs land as parquet files and flow through the
       Structured-Streaming incremental indexer into per-batch deltas
       (the ongoing crawl);
    3. v2 = merge_into_snapshot: v1 ∪ deltas re-derived and committed
       as a new immutable snapshot (operation "merge-append").

    The gates read the CURRENT snapshot (v2) against the batch oracles
    over the WHOLE documents table — update must be value-invisible —
    and v1 stays time-travelable underneath."""
    if sf_dir not in _MERGED:
        from .index.builder import build_index
        from .index.snapshots import commit_snapshot, snapshot_lineage
        from .streaming.incremental import merge_into_snapshot

        base = os.path.join(tempfile.gettempdir(), "irs_snapmerge",
                            f"pid{os.getpid()}",
                            sf_dir.strip("/").replace("/", "_"))
        shutil.rmtree(base, ignore_errors=True)
        root = os.path.join(base, "snaps")
        docs = EQ.load_documents(spark, sf_dir)
        v1 = commit_snapshot(
            build_index(docs.filter(F.col("doc_id") < MERGE_SPLIT_DOC_ID),
                        EQ.NOSTEM_CFG, doc_col="doc_id", text_col="text",
                        with_positions=False),
            root, EQ.NOSTEM_CFG, operation="initial-build")
        in_dir = os.path.join(base, "in")
        docs.filter(F.col("doc_id") >= MERGE_SPLIT_DOC_ID).repartition(8) \
            .write.parquet(in_dir)
        q = incremental_index_stream(
            spark, in_dir,
            checkpoint_dir=os.path.join(base, "ckpt"),
            out_dir=os.path.join(base, "delta"),
            cfg=EQ.NOSTEM_CFG,
        )
        try:
            finished = q.awaitTermination(STREAM_TIMEOUT_SEC)
        finally:
            q.stop()
        if not finished:
            raise RuntimeError(f"merge-lifecycle stream did not drain ({base})")
        v2 = merge_into_snapshot(spark, root, os.path.join(base, "delta"),
                                 EQ.NOSTEM_CFG, note="streamed crawl delta")
        lineage = [e["id"] for e in snapshot_lineage(root)]
        assert lineage == [v2, v1], lineage
        _MERGED[sf_dir] = root
    return _MERGED[sf_dir]


def q_merged_snapshot_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term stats from the CURRENT snapshot after the batch->stream->
    merge-append lifecycle, against the batch oracle over the whole
    corpus: the update path must be value-invisible."""
    from .index.snapshots import read_snapshot

    root = _merged_snapshot_root(spark, sf_dir)
    ix = read_snapshot(spark, root)
    return ix.terms.select("term", F.col("df").cast("long").alias("df"),
                           F.col("cf").cast("long").alias("cf"))


def q_merged_snapshot_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k SERVED from the merge-committed snapshot (same oracle
    as the batch bm25_topk — scoring reads df/dl/avgdl through the
    merged stats, so any merge drift would surface in scores)."""
    from .index.snapshots import read_snapshot
    from .query import scoring

    root = _merged_snapshot_root(spark, sf_dir)
    ix = read_snapshot(spark, root)
    res = scoring.bm25_search(ix, EQ.query_terms_df(spark), k=EQ.TOPK,
                              cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


STREAMING_QUERIES = {
    "merged_snapshot_term_df": q_merged_snapshot_term_df,
    "merged_snapshot_bm25": q_merged_snapshot_bm25,
    "stream_dedup": q_stream_dedup,
    "stream_term_df": q_stream_term_df,
    "compacted_term_df": q_compacted_term_df,
    "compacted_bm25": q_compacted_bm25,
    "stream_events_tumbling": q_stream_events_tumbling,
}
from .entry_eval import SQL_EVENTS_TUMBLING  # noqa: E402  (loaded before this module)

STREAMING_ORACLES = {
    "merged_snapshot_term_df": EQ.SQL_TERM_DF,
    "merged_snapshot_bm25": EQ.SQL_BM25_TOPK,
    "stream_dedup": SQL_STREAM_DEDUP,
    "stream_term_df": EQ.SQL_TERM_DF,
    "compacted_term_df": EQ.SQL_TERM_DF,
    "compacted_bm25": EQ.SQL_BM25_TOPK,
    "stream_events_tumbling": SQL_EVENTS_TUMBLING,
}
