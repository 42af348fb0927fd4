"""Gradeable queries over the PERSISTED serving layouts — what a cluster
actually serves from:

- ``bm25_served``: write_index -> read_index (bucketed parquet postings,
  partition-pruned by hash(term)) -> exact BM25 top-k.  Same oracle as
  the in-memory ``bm25_topk``: the round-trip must be value-invisible.
- ``wand_served``: compressed block layout (delta+VByte, block-max
  metadata) through write_block_index -> read_block_index -> WAND
  kernel.  Same oracle again (WAND is exact).
- ``bm25_full``: FULL result projection (J5) — docs carries corpus
  metadata (lang/source/n_chars here; title/authors/year/journal in the
  reference's documents.idx, DocInfoFull.java:34-94) and the top-k
  result returns it.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import entry_queries as EQ
from .index import builder as B
from .index.compression import build_block_postings, build_dl_blocks, read_block_index, write_block_index
from .query import scoring
from .query.batch import project_results

_SERVE_CACHE: dict[str, object] = {}

#: round-trip caches are PER-PROCESS (pid in the path): two concurrent
#: suite runs on the same sf_dir must not mode=overwrite a layout the
#: other process holds live readers on
_TMP_TAG = f"pid{os.getpid()}"


def _served_ix(spark: SparkSession, sf_dir: str) -> B.IndexTables:
    key = f"ix:{sf_dir}"
    if key not in _SERVE_CACHE:
        ix = EQ.get_index(spark, sf_dir)
        out = os.path.join(tempfile.gettempdir(), "irs_served", _TMP_TAG,
                           sf_dir.strip("/").replace("/", "_"))
        B.write_index(ix, out, EQ.NOSTEM_CFG)
        _SERVE_CACHE[key] = B.read_index(spark, out)
    return _SERVE_CACHE[key]


def q_bm25_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    ix = _served_ix(spark, sf_dir)
    res = scoring.bm25_search(ix, EQ.query_terms_df(spark), k=EQ.TOPK, cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


WAND_TERM_BUCKETS = 8


def q_wand_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAND over the persisted compressed layout, through the PRUNED read
    path: the layout is listed once (keep_bucket=True) and the query's
    tbucket partition filter + dl semi-join are applied inside
    bm25_topk_wand — the graded plan is the serving plan."""
    from .query.wand import bm25_topk_wand

    key = f"blocks:{sf_dir}"
    if key not in _SERVE_CACHE:
        ix = EQ.get_index(spark, sf_dir)
        blocks = build_block_postings(ix.postings, block_span=256)
        dlb = build_dl_blocks(ix.docs, block_span=256)
        out = os.path.join(tempfile.gettempdir(), "irs_served_blocks", _TMP_TAG,
                           sf_dir.strip("/").replace("/", "_"))
        write_block_index(blocks, dlb, out, term_buckets=WAND_TERM_BUCKETS)
        _SERVE_CACHE[key] = read_block_index(spark, out, keep_bucket=True)
    blocks, dlb = _SERVE_CACHE[key]
    ix = _served_ix(spark, sf_dir)
    out = bm25_topk_wand(blocks, dlb, ix.terms, ix.stats,
                         list(EQ.QUERY_TERMS), k=EQ.TOPK, cfg=EQ.NOSTEM_CFG,
                         block_span=256, docs=ix.docs,
                         term_buckets=WAND_TERM_BUCKETS)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


def _full_ix(spark: SparkSession, sf_dir: str) -> B.IndexTables:
    key = f"full:{sf_dir}"
    if key not in _SERVE_CACHE:
        docs = EQ.load_documents(spark, sf_dir)
        _SERVE_CACHE[key] = B.build_index(
            docs, EQ.NOSTEM_CFG, doc_col="doc_id", text_col="text",
            with_positions=False, meta_cols=["lang", "source", "n_chars"],
        )
    return _SERVE_CACHE[key]


def q_bm25_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL projection: top-k plus every docs column (J5)."""
    ix = _full_ix(spark, sf_dir)
    ranked = scoring.bm25_search(ix, EQ.query_terms_df(spark), k=EQ.TOPK, cfg=EQ.NOSTEM_CFG)
    full = project_results(ranked.select("doc_id", "score"), ix.docs, "FULL")
    return full.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
        F.col("length").cast("long").alias("length"),
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )


SQL_BM25_FULL = f"""
WITH topk AS ({EQ.SQL_BM25_TOPK}),
dl AS (SELECT doc_id, count(*) AS length FROM (
         SELECT doc_id,
                unnest(string_split_regex(trim(lower(regexp_replace(regexp_replace(text,
                     '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +')) AS term
         FROM documents) WHERE term <> '' GROUP BY doc_id)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id, t.score,
       CAST(coalesce(dl.length, 0) AS BIGINT) AS length,
       d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM topk t
JOIN documents d ON d.doc_id = t.doc_id
LEFT JOIN dl ON dl.doc_id = t.doc_id
"""


def q_code_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the input_hint corpus shape (repo, path, commit, lang,
    content) with the canonical STRING doc key — exercises the
    two-phase doc_int densification the integer-keyed entries skip."""
    from .sources.corpus import corpus_from_documents, doc_key_expr

    key = f"code:{sf_dir}"
    if key not in _SERVE_CACHE:
        corpus = corpus_from_documents(EQ.load_documents(spark, sf_dir)).withColumn(
            "doc_key", doc_key_expr())
        _SERVE_CACHE[key] = B.build_index(
            corpus, EQ.NOSTEM_CFG, doc_col="doc_key", text_col="content",
            with_positions=False)
    ix = _SERVE_CACHE[key]
    res = scoring.bm25_search(ix, EQ.query_terms_df(spark), k=EQ.TOPK, cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").alias("doc_key"),
                      F.round("score", 4).alias("score"))


SQL_CODE_BM25 = f"""
WITH keyed AS (
  SELECT sha256(concat_ws('|',
           'org/' || source,
           'src/f' || CAST(doc_id AS VARCHAR) || '.txt',
           md5(source || ':' || CAST(doc_id AS VARCHAR)))) AS doc_key,
         text
  FROM documents
),
raw AS (
  SELECT doc_key,
         unnest(string_split_regex(
           trim(lower(regexp_replace(regexp_replace(text,
                '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g'), '[0-9]', ' ', 'g'))),
           ' +')) AS term
  FROM keyed
),
toks AS (SELECT doc_key, term FROM raw WHERE term <> ''),
post AS (SELECT doc_key, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT k.doc_key, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM keyed k LEFT JOIN (SELECT doc_key, count(*) AS dl FROM toks GROUP BY 1) t
         USING (doc_key)),
stats AS (SELECT CAST((SELECT count(*) FROM keyed) AS DOUBLE) AS n,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM keyed) AS DOUBLE) AS avgdl),
q AS (SELECT unnest({EQ._sql_terms_list()}) AS term),
scored AS (
  SELECT p.doc_key,
         (ln((s.n - f.df + 0.5) / (f.df + 0.5)) / ln(2))
           * p.tf * ({EQ.K1} + 1)
           / (p.tf + {EQ.K1} * (1 - {EQ.B} + {EQ.B} * d.dl / s.avgdl)) AS ts
  FROM post p JOIN q USING (term) JOIN dft f USING (term)
  JOIN dl d USING (doc_key) CROSS JOIN stats s
)
SELECT doc_key, round(sum(ts), 4) AS score
FROM scored GROUP BY doc_key
ORDER BY sum(ts) DESC, doc_key ASC
LIMIT {EQ.TOPK}
"""


def q_phrase_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional path through the PERSISTED layout: a with-positions
    index written via write_index (positions ride the bucketed postings
    parquet as array<int>), read back, phrase-searched — same oracle as
    the in-memory phrase gate (the round-trip must be value-invisible)."""
    from .entry_batch import PHRASE, PHRASE_K
    from .query.phrase import phrase_search

    key = f"posix:{sf_dir}"
    if key not in _SERVE_CACHE:
        docs = EQ.load_documents(spark, sf_dir)
        ix = B.build_index(docs, EQ.NOSTEM_CFG, doc_col="doc_id", text_col="text",
                           with_positions=True)
        out = os.path.join(tempfile.gettempdir(), "irs_served_pos", _TMP_TAG,
                           sf_dir.strip("/").replace("/", "_"))
        B.write_index(ix, out, EQ.NOSTEM_CFG)
        _SERVE_CACHE[key] = B.read_index(spark, out)
    ix = _SERVE_CACHE[key]
    res = phrase_search(ix, list(PHRASE), k=PHRASE_K)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("score").cast("long").alias("n_occurrences"))


def q_routed_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based routing over the served layouts: the planner picks
    WAND or the exhaustive join from Σ df (both paths are exact, so the
    oracle is the same either way — routing must be value-invisible)."""
    from .query.wand import route_bm25

    key = f"blocks:{sf_dir}"
    if key not in _SERVE_CACHE:
        q_wand_served(spark, sf_dir)  # builds + caches the block layout
    blocks, dlb = _SERVE_CACHE[key]
    ix = _served_ix(spark, sf_dir)
    out, route = route_bm25(ix, blocks, dlb, EQ.query_terms_df(spark),
                            k=EQ.TOPK, cfg=EQ.NOSTEM_CFG, block_span=256,
                            term_buckets=WAND_TERM_BUCKETS)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


def q_snapshot_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot lineage EXECUTED: commit the full-corpus index as
    snapshot v1, then commit a shrunk index (doc_id < 250, a
    delete/compaction commit) as v2 — and TIME-TRAVEL read v1 term
    stats with v2 current.  Green means a later commit cannot disturb
    an earlier snapshot (immutability), gated against the same batch
    oracle as term_df."""
    from .index.snapshots import commit_snapshot, read_snapshot, snapshot_lineage

    key = f"snap:{sf_dir}"
    if key not in _SERVE_CACHE:
        root = os.path.join(tempfile.gettempdir(), "irs_snapshots", _TMP_TAG,
                            sf_dir.strip("/").replace("/", "_"))
        docs = EQ.load_documents(spark, sf_dir)
        v1 = commit_snapshot(
            B.build_index(docs, EQ.NOSTEM_CFG, doc_col="doc_id", text_col="text",
                          with_positions=False),
            root, EQ.NOSTEM_CFG, operation="initial-build")
        v2 = commit_snapshot(
            B.build_index(docs.filter(F.col("doc_id") < 250), EQ.NOSTEM_CFG,
                          doc_col="doc_id", text_col="text", with_positions=False),
            root, EQ.NOSTEM_CFG, operation="delete",
            note="drop doc_id >= 250")
        lineage = [e["id"] for e in snapshot_lineage(root)]
        assert lineage == [v2, v1], lineage
        _SERVE_CACHE[key] = root
    root = _SERVE_CACHE[key]
    ix_v1 = read_snapshot(spark, root, snapshot_id=1)
    return ix_v1.terms.select("term", F.col("df").cast("long").alias("df"),
                              F.col("cf").cast("long").alias("cf"))


def q_expired_snapshot_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention GC EXECUTED as a gate: commit a shrunk v1 then the
    full-corpus v2, expire to keep_last=1 (v1's directory is deleted,
    v2's dangling parent pointer truncated with the expired_parent
    audit field), and grade term stats read from the surviving CURRENT
    snapshot — against the same batch oracle as term_df.  Green means
    GC removed exactly the expired version and nothing else."""
    from .index.snapshots import (commit_snapshot, expire_snapshots,
                                  read_snapshot, snapshot_log)

    key = f"expire:{sf_dir}"
    if key not in _SERVE_CACHE:
        root = os.path.join(tempfile.gettempdir(), "irs_snapexpire", _TMP_TAG,
                            sf_dir.strip("/").replace("/", "_"))
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        docs = EQ.load_documents(spark, sf_dir)
        v1 = commit_snapshot(
            B.build_index(docs.filter(F.col("doc_id") < 100), EQ.NOSTEM_CFG,
                          doc_col="doc_id", text_col="text", with_positions=False),
            root, EQ.NOSTEM_CFG, operation="initial-build")
        commit_snapshot(
            B.build_index(docs, EQ.NOSTEM_CFG, doc_col="doc_id",
                          text_col="text", with_positions=False),
            root, EQ.NOSTEM_CFG, operation="re-crawl", note="full corpus")
        expired = expire_snapshots(root, keep_last=1)
        assert expired == [v1], expired
        assert not os.path.isdir(os.path.join(root, f"v{v1}"))
        log = snapshot_log(root)
        assert len(log) == 1 and log[0]["parent"] is None \
            and log[0]["expired_parent"] == v1, log
        _SERVE_CACHE[key] = root
    root = _SERVE_CACHE[key]
    ix = read_snapshot(spark, root)
    return ix.terms.select("term", F.col("df").cast("long").alias("df"),
                           F.col("cf").cast("long").alias("cf"))


# --- quantized impact layout ---------------------------------------------------

IMPACT_BITS = 8


def q_impact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over the quantized impact layout (index/impacts.py):
    per-posting BM25 partials (non-negative Lucene-idf variant —
    quantization needs a non-negative score; see the module docstring)
    precomputed at build, quantized to {IMPACT_BITS}-bit ints against the
    global max, served as a pure int64-sum plan.  The oracle implements
    the identical quantizer in SQL."""
    from .index.impacts import impact_topk, quantized_impacts

    key = f"impacts:{sf_dir}"
    if key not in _SERVE_CACHE:
        ix = EQ.get_index(spark, sf_dir)
        impacts, max_s = quantized_impacts(ix, EQ.NOSTEM_CFG, bits=IMPACT_BITS)
        _SERVE_CACHE[key] = impacts.cache()
    return impact_topk(_SERVE_CACHE[key], EQ.query_terms_df(spark), k=EQ.TOPK)


def _sql_impact_topk() -> str:
    scale = 2 ** IMPACT_BITS
    return f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
scored AS (
  SELECT p.doc_id, p.term,
         (ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) / ln(2))
           * p.tf * ({EQ.K1} + 1)
           / (p.tf + {EQ.K1} * (1 - {EQ.B} + {EQ.B} * d.dl / s.avgdl)) AS ts
  FROM post p
  JOIN dft f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
),
maxs AS (SELECT max(ts) AS m FROM scored),
impacts AS (
  SELECT doc_id, term,
         least({scale - 1}, CAST(floor(ts / maxs.m * {scale}) AS BIGINT)) AS impact
  FROM scored CROSS JOIN maxs
),
q AS (SELECT unnest({EQ._sql_terms_list()}) AS term)
SELECT CAST(i.doc_id AS BIGINT) AS doc_id,
       CAST(sum(i.impact) AS BIGINT) AS impact_score
FROM impacts i JOIN q USING (term)
GROUP BY i.doc_id
ORDER BY sum(i.impact) DESC, i.doc_id ASC
LIMIT {EQ.TOPK}
"""


# --- code-identifier subtoken analyzer -------------------------------------------

#: deterministic identifier injection (the synthetic corpus is plain
#: lowercase prose, so the gate appends one code identifier per doc,
#: selected by doc_id — engine and oracle build the same augmented
#: content, exactly the PII-gate pattern)
SUBTOKEN_IDENTS = ["getSparkJoin", "HTTPServerFast", "parse_sql_plan",
                   "MergeBatchWindow"]
SUBTOKEN_TERMS = ["get", "spark", "join", "http", "server", "fast",
                  "parse", "sql", "plan", "merge", "batch", "window"]


def q_subtoken_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf per (doc, term) through the code-identifier subtoken analyzer
    (sources/corpus.identifier_split_expr): camelCase/acronym boundaries
    become token breaks before normalization, so ``server`` matches
    ``HTTPServerFast``.  Restricted to the injected subtoken set (terms
    like ``spark`` combine base-text and identifier occurrences — both
    contributions are graded)."""
    from .analysis.analyzer import tokens_array_expr
    from .sources.corpus import identifier_split_expr

    docs = EQ.load_documents(spark, sf_dir)
    idents = F.array(*[F.lit(s) for s in SUBTOKEN_IDENTS])
    aug = docs.select(
        "doc_id",
        F.concat("text", F.lit(" "),
                 F.element_at(idents, (F.col("doc_id") % 4 + 1).cast("int"))
                 ).alias("content"))
    toks = aug.select(
        "doc_id",
        F.explode(tokens_array_expr(identifier_split_expr(F.col("content")))).alias("term"))
    return (toks.filter(F.col("term").isin(SUBTOKEN_TERMS))
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("long").alias("tf"))
            .select(F.col("doc_id").cast("long").alias("doc_id"), "term", "tf"))


def _sql_subtoken_tf() -> str:
    idents = ", ".join(f"'{s}'" for s in SUBTOKEN_IDENTS)
    terms = ", ".join(f"'{t}'" for t in SUBTOKEN_TERMS)
    return f"""
WITH aug AS (
  SELECT doc_id,
         text || ' ' || ([{idents}])[CAST(doc_id % 4 AS INTEGER) + 1] AS content
  FROM documents
),
split AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(content,
             '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
             '([a-z0-9])([A-Z])', '\\1 \\2', 'g') AS s
  FROM aug
),
raw AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(regexp_replace(regexp_replace(s,
             '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +')) AS term
  FROM split
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term, CAST(count(*) AS BIGINT) AS tf
FROM raw WHERE term IN ({terms})
GROUP BY 1, 2
"""


# --- composed code-corpus pipeline: ingest -> HEAD -> curate -> rank --------------


def q_code_pipeline_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The code-tier lifecycle composed end-to-end in one flow: the
    multi-line code corpus arrives at two versions per file (stale +
    current), HEAD resolution keeps the newest (`latest_file_version`,
    map-side max_by), the Stack quality filters drop the pathological
    bands (`code_quality`), and BM25 top-k runs over ONLY the surviving
    files (index built on the curated sub-corpus — its df/N/avgdl stats
    reflect what curation kept, exactly like a production rebuild after
    a curation pass).

    The oracle recomputes keep from scratch (the code_quality CTE) and
    scores the survivors — two compositions, one answer."""
    from .entry_textops import _code_files
    from .sources.corpus import latest_file_version
    from .textops.quality import code_quality

    key = f"codepipe:{sf_dir}"
    if key not in _SERVE_CACHE:
        files = _code_files(EQ.load_documents(spark, sf_dir), tails=True)
        vers = files.select(
            "doc_id",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("version"),
            "content",
        ).select(
            "doc_id", "version",
            F.when(F.col("version") == 1, F.col("content"))
             .otherwise(F.concat(F.lit("stale "), F.col("content")))
             .alias("content"))
        head = latest_file_version(vers, version_col="version",
                                   keys=("doc_id",))
        kept_ids = (code_quality(head, "content", "doc_id")
                    .filter("keep").select(F.col("id").alias("doc_id")))
        kept = head.join(kept_ids, "doc_id", "left_semi")
        _SERVE_CACHE[key] = B.build_index(
            kept, EQ.NOSTEM_CFG, doc_col="doc_id", text_col="content",
            with_positions=False)
    ix = _SERVE_CACHE[key]
    res = scoring.bm25_search(ix, EQ.query_terms_df(spark), k=EQ.TOPK,
                              cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


def _sql_code_pipeline_topk() -> str:
    from .entry_textops import SQL_CODE_QUALITY

    return f"""
WITH cq AS ({SQL_CODE_QUALITY}),
kept AS (SELECT id AS doc_id FROM cq WHERE keep),
raw AS (
  SELECT d.doc_id,
         unnest(string_split_regex(trim(lower(regexp_replace(regexp_replace(d.text,
             '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +')) AS term
  FROM documents d JOIN kept USING (doc_id)
),
toks AS (SELECT doc_id, term FROM raw WHERE term <> ''),
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT k.doc_id, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM kept k LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT CAST((SELECT count(*) FROM kept) AS DOUBLE) AS n,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM kept) AS DOUBLE) AS avgdl),
q AS (SELECT unnest({EQ._sql_terms_list()}) AS term),
scored AS (
  SELECT p.doc_id,
         (ln((s.n - f.df + 0.5) / (f.df + 0.5)) / ln(2))
           * p.tf * ({EQ.K1} + 1)
           / (p.tf + {EQ.K1} * (1 - {EQ.B} + {EQ.B} * d.dl / s.avgdl)) AS ts
  FROM post p JOIN q USING (term) JOIN dft f USING (term)
  JOIN dl d USING (doc_id) CROSS JOIN stats s
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, round(sum(ts), 4) AS score
FROM scored GROUP BY doc_id
ORDER BY sum(ts) DESC, doc_id ASC
LIMIT {EQ.TOPK}
"""


# --- per-repo result rollup -------------------------------------------------------

REPO_TOPK = 10


def q_repo_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-results-by-repository (the GitHub-code-search result
    shape): rank repos by their best file's BM25 score, carrying the
    matched-file count.  Uses ``bm25_scores`` (the UNCUT scoring plan) —
    a doc-level top-k before the rollup would drop repos whose best file
    sits below the doc cut.  Aggregation above the doc level is one
    extra partial-aggregable shuffle on the repo key."""
    ix = EQ.get_index(spark, sf_dir)
    scores = scoring.bm25_scores(ix, EQ.query_terms_df(spark), cfg=EQ.NOSTEM_CFG)
    repos = EQ.load_documents(spark, sf_dir).select(
        "doc_id", F.concat(F.lit("org/"), F.col("source")).alias("repo"))
    return (scores.join(repos, "doc_id")
            .groupBy("repo")
            .agg(F.round(F.max("score"), 4).alias("best_score"),
                 F.count("*").cast("long").alias("n_files"))
            .orderBy(F.desc("best_score"), F.asc("repo"))
            .limit(REPO_TOPK))


SQL_REPO_TOPK = f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
q AS (SELECT unnest({EQ._sql_terms_list()}) AS term),
scored AS (
  SELECT p.doc_id,
         (ln((s.n - f.df + 0.5) / (f.df + 0.5)) / ln(2))
           * p.tf * ({EQ.K1} + 1)
           / (p.tf + {EQ.K1} * (1 - {EQ.B} + {EQ.B} * d.dl / s.avgdl)) AS ts
  FROM post p JOIN q USING (term) JOIN dft f USING (term)
  JOIN dl d USING (doc_id) CROSS JOIN stats s
),
docscore AS (SELECT doc_id, sum(ts) AS score FROM scored GROUP BY doc_id)
SELECT 'org/' || d.source AS repo,
       round(max(ds.score), 4) AS best_score,
       CAST(count(*) AS BIGINT) AS n_files
FROM docscore ds JOIN documents d USING (doc_id)
GROUP BY 1
ORDER BY round(max(ds.score), 4) DESC, repo ASC
LIMIT {REPO_TOPK}
"""


# --- HEAD resolution over a multi-commit corpus ----------------------------------


def q_latest_file_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest HEAD resolution (sources/corpus.latest_file_version): each
    file arrives at two versions (version 0 = stale content prefixed
    'stale ', version 1 = current); ONE map-side-combining max_by per
    (repo, path) keeps the newest.  Output pins the resolved content by
    sha256 — the input_hint's per-row invariant — so the gate catches a
    wrong-version pick, not just a wrong count."""
    from .sources.corpus import corpus_from_documents, latest_file_version

    corpus = corpus_from_documents(EQ.load_documents(spark, sf_dir))
    vers = corpus.select(
        "repo", "path",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("version"),
        "content",
    ).select(
        "repo", "path", "version",
        F.when(F.col("version") == 1, F.col("content"))
         .otherwise(F.concat(F.lit("stale "), F.col("content"))).alias("content"),
    )
    out = latest_file_version(vers, version_col="version")
    return out.select("repo", "path",
                      F.col("version").cast("long").alias("version"),
                      F.sha2(F.col("content"), 256).alias("content_sha"))


SQL_LATEST_FILE_VERSION = """
WITH corpus AS (
  SELECT 'org/' || source AS repo,
         'src/f' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         text AS content
  FROM documents
),
vers AS (
  SELECT repo, path, v AS version,
         CASE WHEN v = 1 THEN content ELSE 'stale ' || content END AS content
  FROM corpus, LATERAL (SELECT unnest([0, 1]) AS v) t(v)
)
SELECT repo, path,
       CAST(max(version) AS BIGINT) AS version,
       arg_max(sha256(content), version) AS content_sha
FROM vers GROUP BY repo, path
"""


# --- symbol extraction (ctags-lite) ----------------------------------------------

#: deterministic code-snippet injection per doc_id%4 (the synthetic
#: corpus is prose; snippet 3 re-defines parse_query so the symbol has
#: cross-doc df, snippet 2 mixes JS/Go forms, snippet 0's nested
#: `def emit` exercises indented definitions, slot 4 injects nothing so
#: zero-symbol docs grade too)
SYMBOL_SNIPPETS = [
    "\ndef parse_query(q):\n    return q\nclass QueryPlanner:\n    pass\n",
    "\nfunction renderTable(rows) {\n}\nfunc mergeBatch(a, b) {\n}\n",
    "\nclass StreamWindow:\n    def emit(self):\n        pass\ndef parse_query(x):\n    pass\n",
    "",
]
SYMBOL_QUERY = "parse_query"


def _symbol_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = EQ.load_documents(spark, sf_dir)
    snips = F.array(*[F.lit(s) for s in SYMBOL_SNIPPETS])
    return docs.select(
        "doc_id",
        F.concat("text",
                 F.element_at(snips, (F.col("doc_id") % 4 + 1).cast("int"))
                 ).alias("content"))


def q_symbol_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Definition-site extraction (analysis/symbols.py): def/class/
    function/func identifiers collected in ONE projection (per-pattern
    regexp_extract_all → kind-tagged structs → single explode), counted
    per (doc, kind, symbol)."""
    from .analysis.symbols import extract_symbols

    out = extract_symbols(_symbol_aug(spark, sf_dir), "content", "doc_id")
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "kind", "symbol", "n_defs")


SYMBOL_BUCKETS = 8


def q_symbol_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``symbol:`` qualifier THROUGH the persisted layout: the
    symbol table is extracted once, written partitioned by
    pmod(hash(symbol), B), and the lookup scans one bucket with the
    equality predicate pushed to parquet.  The round-trip must be
    value-invisible (same oracle as ad-hoc extraction)."""
    from .analysis.symbols import (extract_symbols, read_symbol_index,
                                   symbol_search_served, write_symbol_index)

    key = f"symbols:{sf_dir}"
    if key not in _SERVE_CACHE:
        out = os.path.join(tempfile.gettempdir(), "irs_symbols", _TMP_TAG,
                           sf_dir.strip("/").replace("/", "_"))
        write_symbol_index(
            extract_symbols(_symbol_aug(spark, sf_dir), "content", "doc_id"),
            out, symbol_buckets=SYMBOL_BUCKETS)
        _SERVE_CACHE[key] = read_symbol_index(spark, out)
    out = symbol_search_served(_SERVE_CACHE[key], SYMBOL_QUERY,
                               symbol_buckets=SYMBOL_BUCKETS)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "kind", "n_defs")


def _sql_symbols(select: str) -> str:
    from .analysis.symbols import SYMBOL_PATTERNS

    snips = ", ".join("'" + s.replace("'", "''") + "'" for s in SYMBOL_SNIPPETS)
    branches = "\n  UNION ALL\n".join(
        f"""  SELECT doc_id, '{kind}' AS kind,
         unnest(regexp_extract_all(content, '{pat}', 1)) AS symbol
  FROM aug""" for kind, pat in SYMBOL_PATTERNS)
    return f"""
WITH aug AS (
  SELECT doc_id,
         text || ([{snips}])[CAST(doc_id % 4 AS INTEGER) + 1] AS content
  FROM documents
),
sym AS (
{branches}
)
{select}
"""


SQL_SYMBOL_EXTRACT = None  # bound below (needs the module-level helper)
SQL_SYMBOL_SEARCH = None


# --- trigram substring / regex search (code-search structure) -------------------

TRIGRAM_NEEDLE = "spark join"
TRIGRAM_REGEX = "spark [a-z]+ join"
TRIGRAM_BUCKETS = 8


def _trigram_served(spark: SparkSession, sf_dir: str):
    """Build + persist the gram-bucketed trigram layout (postings +
    build-time gramdf table) once per sf_dir, then serve from the
    partition-pruned read path (index/trigram.py).  -> (postings,
    gram_df)."""
    from .index.trigram import (read_gram_df, read_trigram_index,
                                trigram_postings, write_trigram_index)

    key = f"trigram:{sf_dir}"
    if key not in _SERVE_CACHE:
        docs = EQ.load_documents(spark, sf_dir)
        posts = trigram_postings(docs, "text", "doc_id")
        out = os.path.join(tempfile.gettempdir(), "irs_trigram", _TMP_TAG,
                           sf_dir.strip("/").replace("/", "_"))
        write_trigram_index(posts, out, gram_buckets=TRIGRAM_BUCKETS)
        _SERVE_CACHE[key] = (read_trigram_index(spark, out),
                             read_gram_df(spark, out))
    return _SERVE_CACHE[key]


def q_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring search through the served trigram layout: rarest
    needle grams -> AND-intersection candidates (bucket-pruned scan) ->
    contains() verification restricted to candidates.  The oracle is the
    semantic ground truth (a full-scan contains)."""
    from .index.trigram import substring_search

    posts, gdf = _trigram_served(spark, sf_dir)
    docs = EQ.load_documents(spark, sf_dir)
    out = substring_search(posts, docs, TRIGRAM_NEEDLE, "text", "doc_id",
                           gram_buckets=TRIGRAM_BUCKETS, gram_df=gdf)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"))


SQL_TRIGRAM_SEARCH = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM documents WHERE contains(text, '{TRIGRAM_NEEDLE}')
"""


def q_trigram_search_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring search (grep -i) over a MIXED-case
    corpus (even doc_ids uppercased, odd kept lower — so the fold is
    what finds the even half): fold-case gram layout, driver-lowered
    needle, lower(text) verification.  The case-sensitive path on this
    corpus would return only the odd half."""
    from .index.trigram import substring_search, trigram_postings

    docs = EQ.load_documents(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.upper("text"))
         .otherwise(F.col("text")).alias("text"))
    posts = trigram_postings(docs, "text", "doc_id", fold_case=True)
    out = substring_search(posts, docs, "SPARK Join", "text", "doc_id",
                           fold_case=True)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"))


SQL_TRIGRAM_SEARCH_CI = """
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM (SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END AS t
      FROM documents)
WHERE contains(lower(t), 'spark join')
"""


def q_appended_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental trigram maintenance EXECUTED: build the layout on
    doc_id < 250, append the rest as a delta (postings append + gramdf
    refresh), then substring-search the appended layout — graded
    against the SAME full-corpus oracle as trigram_search (append must
    be value-invisible)."""
    from .index.trigram import (append_trigram_delta, read_gram_df,
                                read_trigram_index, substring_search,
                                trigram_postings, write_trigram_index)

    key = f"trigram_app:{sf_dir}"
    if key not in _SERVE_CACHE:
        docs = EQ.load_documents(spark, sf_dir)
        out = os.path.join(tempfile.gettempdir(), "irs_trigram_app", _TMP_TAG,
                           sf_dir.strip("/").replace("/", "_"))
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        write_trigram_index(
            trigram_postings(docs.filter(F.col("doc_id") < 250), "text", "doc_id"),
            out, gram_buckets=TRIGRAM_BUCKETS)
        append_trigram_delta(docs.filter(F.col("doc_id") >= 250), out,
                             "text", "doc_id", gram_buckets=TRIGRAM_BUCKETS)
        _SERVE_CACHE[key] = (read_trigram_index(spark, out),
                             read_gram_df(spark, out))
    posts, gdf = _SERVE_CACHE[key]
    docs = EQ.load_documents(spark, sf_dir)
    out = substring_search(posts, docs, TRIGRAM_NEEDLE, "text", "doc_id",
                           gram_buckets=TRIGRAM_BUCKETS, gram_df=gdf)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"))


BATCH_NEEDLES = {1: "spark join", 2: "merge window", 3: "zzz never",
                 4: "stream batch"}


def q_batch_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-query-set substring search in ONE plan (the batch
    amortization story applied to the trigram path): all needles' grams
    ship as one tagged broadcast table, one postings pass, one
    candidate-restricted column-wise contains() verify.  Needle 3 has
    zero hits — the empty-result qid grades too (by absence)."""
    from .index.trigram import batch_substring_search

    posts, gdf = _trigram_served(spark, sf_dir)
    docs = EQ.load_documents(spark, sf_dir)
    out = batch_substring_search(posts, docs, BATCH_NEEDLES, "text", "doc_id",
                                 gram_buckets=TRIGRAM_BUCKETS, gram_df=gdf)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("doc_id").cast("long").alias("doc_id"))


SQL_BATCH_TRIGRAM_SEARCH = """
SELECT CAST(q.qid AS BIGINT) AS qid, CAST(d.doc_id AS BIGINT) AS doc_id
FROM documents d,
     (VALUES (1, 'spark join'), (2, 'merge window'), (3, 'zzz never'),
             (4, 'stream batch')) q(qid, needle)
WHERE contains(d.text, q.needle)
"""


def q_regex_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact regex search with the trigram literal-run prefilter
    (conservative Cox compilation: extracted literals are REQUIRED, so
    candidates are a superset and rlike verification is exact).  The
    pattern stays in the Java∩RE2 subset so DuckDB grades it."""
    from .index.trigram import regex_search

    posts, gdf = _trigram_served(spark, sf_dir)
    docs = EQ.load_documents(spark, sf_dir)
    out = regex_search(posts, docs, TRIGRAM_REGEX, "text", "doc_id",
                       gram_buckets=TRIGRAM_BUCKETS, gram_df=gdf)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"))


SQL_REGEX_SEARCH = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM documents WHERE regexp_matches(text, '{TRIGRAM_REGEX}')
"""


def q_grep_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grep-style per-line hits for "spark join" over the line-chunked
    corpus (the multi-line derivation the code_quality gate uses, no
    tails): the line explode runs ONLY on trigram-candidate docs —
    semi-join first, posexplode after."""
    from .entry_textops import _code_files
    from .index.trigram import grep_lines, trigram_postings

    files = _code_files(EQ.load_documents(spark, sf_dir), tails=False)
    posts = trigram_postings(files, "content", "doc_id")
    out = grep_lines(posts, files, TRIGRAM_NEEDLE, "content", "doc_id")
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "line_no", "line")


SQL_GREP_LINES = f"""
WITH tokarr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(regexp_replace(regexp_replace(text,
             '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +'),
             t -> t <> '') AS toks
  FROM documents
),
chunks AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(toks) / 8.0) AS BIGINT)),
                        i -> array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 8), ' ')) AS cs
  FROM tokarr
),
lines AS (
  SELECT doc_id, pos AS line_no, ln
  FROM (SELECT doc_id,
               unnest(list_transform(range(len(cs)),
                      i -> {{'pos': i, 'ln': cs[i + 1]}}), recursive := true)
        FROM chunks)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(line_no AS BIGINT) AS line_no,
       ln AS line
FROM lines WHERE contains(ln, '{TRIGRAM_NEEDLE}')
"""


def q_trigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram df stats off the served postings (the table a planner
    orders needle grams by); deterministic (df desc, gram asc) top-20."""
    from .index.trigram import trigram_df_stats

    return trigram_df_stats(_trigram_served(spark, sf_dir)[0], top_n=20)


SQL_TRIGRAM_STATS = """
WITH g AS (
  SELECT DISTINCT doc_id, substring(text, CAST(i AS INTEGER), 3) AS gram
  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text)-2)) AS i) t(i)
)
SELECT gram, CAST(count(*) AS BIGINT) AS df
FROM g GROUP BY gram ORDER BY df DESC, gram ASC LIMIT 20
"""


SERVING_QUERIES = {
    "code_pipeline_topk": q_code_pipeline_topk,
    "repo_topk": q_repo_topk,
    "latest_file_version": q_latest_file_version,
    "symbol_extract": q_symbol_extract,
    "symbol_search": q_symbol_search,
    "subtoken_tf": q_subtoken_tf,
    "trigram_search": q_trigram_search,
    "batch_trigram_search": q_batch_trigram_search,
    "appended_trigram_search": q_appended_trigram_search,
    "trigram_search_ci": q_trigram_search_ci,
    "grep_lines": q_grep_lines,
    "regex_search": q_regex_search,
    "trigram_stats": q_trigram_stats,
    "impact_topk": q_impact_topk,
    "expired_snapshot_term_df": q_expired_snapshot_term_df,
    "bm25_served": q_bm25_served,
    "wand_served": q_wand_served,
    "bm25_full": q_bm25_full,
    "code_bm25": q_code_bm25,
    "snapshot_term_df": q_snapshot_term_df,
    "phrase_served": q_phrase_served,
    "routed_bm25": q_routed_bm25,
}

SERVING_ORACLES = {
    "code_pipeline_topk": _sql_code_pipeline_topk(),
    "repo_topk": SQL_REPO_TOPK,
    "latest_file_version": SQL_LATEST_FILE_VERSION,
    "symbol_extract": _sql_symbols(
        """SELECT CAST(doc_id AS BIGINT) AS doc_id, kind, symbol,
       CAST(count(*) AS BIGINT) AS n_defs
FROM sym GROUP BY 1, 2, 3"""),
    "symbol_search": _sql_symbols(
        """SELECT CAST(doc_id AS BIGINT) AS doc_id, kind,
       CAST(count(*) AS BIGINT) AS n_defs
FROM sym WHERE symbol = 'parse_query' GROUP BY 1, 2"""),
    "subtoken_tf": _sql_subtoken_tf(),
    "trigram_search": SQL_TRIGRAM_SEARCH,
    "batch_trigram_search": SQL_BATCH_TRIGRAM_SEARCH,
    "appended_trigram_search": SQL_TRIGRAM_SEARCH,
    "trigram_search_ci": SQL_TRIGRAM_SEARCH_CI,
    "grep_lines": SQL_GREP_LINES,
    "regex_search": SQL_REGEX_SEARCH,
    "trigram_stats": SQL_TRIGRAM_STATS,
    "impact_topk": _sql_impact_topk(),
    "expired_snapshot_term_df": EQ.SQL_TERM_DF,
    "bm25_served": EQ.SQL_BM25_TOPK,
    "wand_served": EQ.SQL_BM25_TOPK,
    "bm25_full": SQL_BM25_FULL,
    "code_bm25": SQL_CODE_BM25,
    "snapshot_term_df": EQ.SQL_TERM_DF,
    "phrase_served": None,  # bound below (same oracle as phrase_search)
    "routed_bm25": EQ.SQL_BM25_TOPK,
}

from .entry_batch import SQL_PHRASE_SEARCH  # noqa: E402  (loaded before this module)

SERVING_ORACLES["phrase_served"] = SQL_PHRASE_SEARCH
