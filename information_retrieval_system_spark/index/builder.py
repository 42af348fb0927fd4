"""Inverted-index build as declarative DataFrame aggregations.

Reference pipeline being re-expressed (SURVEY.md §3 E1): stream JSON docs ->
tokenize/stem -> per-batch partial indexes -> pairwise merge cascade ->
second pass for VSM norms + avgDL (Indexer.java:597-686, 735-961;
Index.java:341-397).  In Spark the partial-index machinery and the merge
cascade dissolve into a single shuffle: ``groupBy(term, doc)`` with
partial+final hash aggregation IS the partial-index dump plus the k-way
merge, with spilling handled by the engine.

Scale notes (10^12 files / 1000 executors):
- doc_int assignment is deterministic AND parallel: a two-phase scheme
  (range partition -> per-partition rank -> prefix-sum offsets, see
  ``assign_doc_ints``) that never funnels the corpus through one task.
- postings are bucketed by ``hash(term) % term_buckets``: the query path
  prunes to the buckets of its query terms, and resume re-runs only
  missing buckets.
- hot terms (df > hot_term_df_ratio * N) are pre-aggregated with a salt
  key then re-aggregated, bounding the largest reducer
  (SURVEY.md §4 item 3).  The groupBy itself is already partial-agg'd
  map-side by Catalyst; salting additionally caps the final-agg key width
  for pathological terms (``the``/``license`` in code corpora).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..analysis.analyzer import analyze_tokens, doc_length_expr, porter_stem_udf
from ..config import DEFAULT_CONFIG, EngineConfig


@dataclass
class IndexTables:
    """The logical index: four DataFrames + scalar stats.

    Maps the reference's on-disk files (SURVEY.md §1.4) to tables:
    vocabulary.idx -> terms; postings.idx -> postings; documents.idx ->
    docs; meta.idx -> stats.
    """

    postings: DataFrame  # term_id, term, doc_id, doc_int, tf, positions
    docs: DataFrame      # doc_id, doc_int, length, norm, pagerank
    terms: DataFrame     # term, df, cf
    stats: dict          # n_docs, avgdl (floored long), n_postings, total_len
    # (term, term_id): dense int64 dictionary in sorted term order —
    # vocabulary.idx's implicit positional rank as a broadcastable
    # column.  None for index views built outside build_index (e.g.
    # streaming delta unions); string-keyed paths never need it.
    term_dict: DataFrame | None = None


def assign_dense_ids(
    df: DataFrame, key_col: str, out_col: str, num_ranges: int | None = None
) -> DataFrame:
    """Deterministic dense int64 ids for the UNIQUE values of ``key_col``
    — rank in global key order, starting at 1.

    Scale-safe two-phase scheme — a naive ``row_number() over (order by
    key)`` funnels the whole input through ONE partition
    (Exchange SinglePartition); instead:

    1. range-partition by the key (parallel sort, P partitions);
    2. rank within each range partition (parallel window per partition);
    3. add per-partition offsets from a tiny counts job.

    Deterministic regardless of sampled range boundaries: concatenating
    range partitions in partition order yields the global key order, so
    ``offset[pid] + local_rank`` IS the global rank of the (unique) key.

    Used for doc ids (``assign_doc_ints`` — the ingestion counter,
    Indexer.java:630-632, made order-independent) and for the term
    dictionary (``term_id`` — the positional rank the reference's sorted
    vocabulary.idx implies, Index.java:215-241, materialized as a
    column so the postings shuffle can carry ints instead of strings).
    """
    spark = df.sparkSession
    if num_ranges is None:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(num_ranges, F.col(key_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # per-partition ranking: the window shuffles by _pid, which preserves
    # the range grouping; orderBy(key) inside re-establishes order.
    w = Window.partitionBy("_pid").orderBy(F.col(key_col))
    # persisted (disk, not exec memory): the pid assignment must be
    # IDENTICAL between the counts job and downstream consumers (range
    # boundaries are sampled per execution), and the corpus-sized rows
    # must not squeeze the shuffle/agg memory of the heavy stages.  In
    # production this stage is a written table (Iceberg), same property.
    from pyspark import StorageLevel

    local = ranged.withColumn("_rn", F.row_number().over(w)).persist(StorageLevel.DISK_ONLY)
    counts = {
        r["_pid"]: r["c"]
        for r in local.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    if not counts:  # empty input: zero-arg create_map won't analyze
        return local.withColumn(out_col, F.lit(None).cast("long")).drop("_pid", "_rn")
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    return local.withColumn(
        out_col, (off_map[F.col("_pid")] + F.col("_rn")).cast("long")
    ).drop("_pid", "_rn")


def assign_doc_ints(corpus: DataFrame, doc_col: str, num_ranges: int | None = None) -> DataFrame:
    """Dense ``doc_int`` for string doc keys — see ``assign_dense_ids``."""
    return assign_dense_ids(corpus, doc_col, "doc_int", num_ranges)


def build_index(
    corpus: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    doc_col: str = "doc_id",
    text_col: str = "content",
    with_positions: bool = True,
    meta_cols: list[str] | None = None,
) -> IndexTables:
    """corpus(doc_col, text_col, ...) -> IndexTables.

    All heavy lifting is shuffle-based aggregation; the only Python is the
    Porter stem over the distinct-token table (analyzer.py).

    ``meta_cols`` names corpus columns carried into ``docs`` for the FULL
    result projection (J5 — the reference's documents.idx stores
    title/authors/year/journal alongside the scoring fields,
    DocInfoFull.java:34-94; here any metadata column rides along the same
    way).  They are joined in at the end from a slim projection, so the
    tokenize/stage path never carries them."""
    spark = corpus.sparkSession

    slim_corpus = corpus.select(F.col(doc_col).alias("doc_id"), F.col(text_col).alias("content"))
    doc_type = dict(slim_corpus.dtypes)["doc_id"]
    if doc_type in ("tinyint", "smallint", "int", "bigint"):
        # doc key is already an integer: use it directly as doc_int — the
        # ranking pass (range shuffle + per-partition window + counts
        # job) exists only to densify STRING keys, and skipping it saves
        # a full corpus pass.  doc_int ordering == doc_id ordering either
        # way, which is all compression/WAND rely on.
        docs_base = slim_corpus.withColumn("doc_int", F.col("doc_id").cast("long"))
    else:
        docs_base = assign_doc_ints(slim_corpus, "doc_id")
    # ONE regex pass over raw text, staged as token ARRAYS on disk: both
    # consumers (doc lengths = pre-filter count T4, and the token stream
    # for postings) read the staged arrays instead of re-running the
    # normalizer — the regex normalize is the dominant CPU of the build
    # and previously ran twice (once for lengths, once for postings).
    from pyspark import StorageLevel

    from ..analysis.analyzer import stopword_filter_condition, tokens_array_expr

    # DISK_ONLY staging kept after an r7 A/B: one interleaved session
    # measured MEMORY_AND_DISK ~30% faster on the build, but two later
    # sessions inverted the ordering and one bench window showed a 5x
    # encode-phase regression with it — all inside this host's 20-40%
    # drift.  DISK_ONLY never competes with the shuffle/agg working set
    # and its 100-TB behavior is unambiguous, so the unproven 1-3 s
    # stays on the table (OPTIMIZATION_r07.md "left alone").
    pre = docs_base.select(
        "doc_id", "doc_int", tokens_array_expr(F.col("content")).alias("_arr")
    ).persist(StorageLevel.DISK_ONLY)

    docs_slim = pre.select(
        "doc_id", "doc_int", F.size("_arr").alias("length")
    ).cache()

    tokens = pre.select(
        "doc_id", "doc_int", F.posexplode("_arr").alias("pos", "token")
    )
    if cfg.use_stopwords:
        tokens = tokens.filter(stopword_filter_condition(F.col("token")))

    # --- term dictionary (dense int64 term_id) ------------------------
    # Every build assigns a dense dictionary — rank 1..V over the sorted
    # distinct TERM set (the positional rank the reference's sorted
    # vocabulary.idx implies, Index.java:215-241), via the same
    # two-phase parallel ranking as doc_int — but WHERE it is built
    # depends on whether it pays for itself (A/B-measured, BENCH.md r6):
    #
    # - STEMMED build: dictionary FIRST, from the distinct token set
    #   (map-side partial distinct shuffles per-partition vocabularies,
    #   not the token stream), stemmed ONCE, then token -> term_id
    #   broadcast into the stream.  The corpus-sized aggregation then
    #   keys on (term_id int64, doc int64) — fixed 8-byte keys instead
    #   of strings — AND the stem-variant collapse folds into the SAME
    #   aggregation (variants share a term_id), so the stemmed build
    #   does ONE corpus shuffle where it previously did two, and the
    #   corpus-sized tok_doc disk staging disappears entirely.  The
    #   extra distinct pass is paid for by the eliminated shuffle.
    #
    # - NO-STEM build: there is no second shuffle to eliminate, and the
    #   interleaved A/B at 600k docs measured every pre-/post-shuffle
    #   id-attachment variant as a 15-45% build slowdown (an extra
    #   token-stream pass, or an extra broadcast-probe pass over the
    #   31M-row postings cache per consumer).  So the single
    #   string-keyed aggregation stays EXACTLY as before; the
    #   dictionary derives from the vocabulary-sized ``terms`` table
    #   (near-free), and term_id attaches lazily — inside write_index's
    #   write plan and inside id-keyed serving — where the broadcast
    #   probe rides an existing pass instead of adding one.
    #
    # Either way: the dictionary is broadcastable, the WRITTEN layout
    # carries term_id, id-keyed serving works identically.
    agg1 = [F.count("*").cast("int").alias("tf")]
    if with_positions:
        agg1.append(F.sort_array(F.collect_list("pos")).alias("positions"))

    if cfg.use_stemmer:
        vocab = tokens.select("token").distinct().withColumn(
            "term", porter_stem_udf("token")
        )
        # cached: build joins it twice, id-keyed queries broadcast it
        term_dict = assign_dense_ids(
            vocab.select("term").distinct(), "term", "term_id"
        ).cache()
        tok2id = vocab.join(F.broadcast(term_dict), "term").select("token", "term_id")
        # A1 (both levels in one agg): tf per (term_id, doc) — Catalyst
        # partial+final hash agg (the map-side combine IS the salted
        # pre-aggregation for the tf metric: the reduce key never
        # concentrates on one reducer because doc spreads hot terms
        # across partitions).  At extreme vocabularies the broadcast
        # hint stops fitting; dropping it lets AQE pick a shuffle join.
        postings = (
            tokens.join(F.broadcast(tok2id), "token", "inner")
            .groupBy("term_id", "doc_id", "doc_int")
            .agg(*agg1)
            # re-attach the string post-agg: BroadcastHashJoin in the
            # same stage — zero extra shuffle, keeps every string-keyed
            # consumer (scoring, WAND, compression) source-compatible
            .join(F.broadcast(term_dict), "term_id")
        ).cache()
        # A3: df/cf per term — keyed by term_id (fixed-width int agg),
        # string attached from the broadcast dictionary.  Cached: every
        # query broadcast-joins terms.
        tstats = postings.groupBy("term_id").agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        ).cache()
        terms = tstats.join(F.broadcast(term_dict), "term_id").select(
            "term", "df", "cf"
        ).cache()
        norm_key, norm_stats = "term_id", tstats.select("term_id", "df")
    else:
        postings = (
            tokens.groupBy("token", "doc_id", "doc_int").agg(*agg1)
            .withColumnRenamed("token", "term")
        ).cache()
        # A3 on the string key (unchanged plan), then rank the
        # vocabulary-sized terms table for the dictionary
        terms = postings.groupBy("term").agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        ).cache()
        term_dict = assign_dense_ids(
            terms.select("term"), "term", "term_id"
        ).cache()
        norm_key, norm_stats = "term", terms.select("term", "df")

    # A4: N + floored avgDL (integer division, Indexer.java:688-691).
    # The doc-stats aggregate is the FIRST action: scanning it both
    # materializes the staged ``pre`` arrays (persist fills on first
    # read) and fills the docs_slim cache, so no separate
    # ``pre.count()`` barrier is needed — one fewer full pass over the
    # corpus per build, which is pure serial time at any cluster size.
    r = docs_slim.agg(
        F.count("*").alias("n_docs"), F.sum("length").alias("total_len")
    ).collect()[0]
    n_docs, total_len = int(r["n_docs"]), int(r["total_len"] or 0)
    # Σdf == posting rows (merge-time df1+df2 of Indexer.java:842 is one
    # partial+final agg); reads the already-staged arrays
    n_postings = int(terms.agg(F.sum("df")).collect()[0][0] or 0)
    avgdl = total_len // n_docs if n_docs else 0

    # A5: VSM norms — second pass over postings, idf uses the reference's
    # Java-int floor division (N+1)/df (Index.java:371). Stored SQUARED,
    # exactly like documents.idx offset+48 (Index.java:385).
    log2 = math.log(2.0)
    norm_df = (
        postings.join(F.broadcast(norm_stats), norm_key)
        .withColumn(
            "w", F.col("tf") * F.log(F.floor(F.lit(n_docs + 1) / F.col("df")).cast("double")) / F.lit(log2)
        )
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("w")).alias("norm"))
    )

    # Cached: the norm aggregation must not rerun per query.
    docs = (
        docs_slim.join(norm_df, "doc_id", "left")
        .withColumn("norm", F.coalesce(F.col("norm"), F.lit(0.0)))
        .withColumn("pagerank", F.lit(0.0))
    )
    if meta_cols:
        meta = corpus.select(F.col(doc_col).alias("doc_id"), *meta_cols)
        docs = docs.join(meta, "doc_id", "left")
    docs = docs.cache()

    stats = {
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": avgdl,
        "n_postings": n_postings,
        # integer doc keys mean doc_int == doc_id: consumers (WAND) can
        # skip the final doc_int -> doc_id mapping join entirely
        "int_doc_ids": doc_type in ("tinyint", "smallint", "int", "bigint"),
    }
    return IndexTables(postings=postings, docs=docs, terms=terms, stats=stats,
                       term_dict=term_dict)


def field_term_stats(
    corpus: DataFrame,
    text_col: str,
    field_col: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """A2: tf/df per (field, term) — the reference's per-field statistics
    exercise (`A1occur`, Indexer.java:200-255) generalized: ``field_col``
    is any categorical column (language, repo, source...)."""
    from ..analysis.analyzer import analyze_tokens

    toks = analyze_tokens(
        corpus.select(F.col(field_col).alias("field"), F.col(text_col).alias("content"))
        .withColumn("_rid", F.monotonically_increasing_id()),
        "content",
        ["field", "_rid"],
        use_stopwords=cfg.use_stopwords,
        use_stemmer=cfg.use_stemmer,
        stem_via_join=False,
    )
    return toks.groupBy("field", "term").agg(
        F.count("*").cast("long").alias("tf"),
        F.countDistinct("_rid").cast("long").alias("df"),
    )


def term_bucket_expr(term, n_buckets: int):
    """Stable bucket id for partition pruning + resume granularity."""
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def write_index(
    tables: IndexTables,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> None:
    """Persist the logical index as a bucketed parquet layout.

    Layout (Iceberg-shaped; in production these are Iceberg tables with
    ``bucket(term)`` partitioning — the sandbox has no Iceberg jars, so we
    use explicit partition columns which give the same pruning):

    - ``postings/`` partitioned by ``bucket`` = hash(term) % term_buckets,
      sorted within partitions by (term, doc_int) — the columnar
      equivalent of the reference's vocabulary-ordered postings file.
      Carries ``term_id`` when the build assigned a dictionary (parquet
      dictionary-encodes the redundant string column to near-nothing on
      disk; the id column is what id-keyed serving joins on).
    - ``docs/``, ``terms/``, ``term_dict/`` (when present), ``stats.json``.
    """
    os.makedirs(out_dir, exist_ok=True)
    p = tables.postings
    if tables.term_dict is not None and "term_id" not in p.columns:
        # no-stem builds keep in-memory postings string-keyed (A/B: an
        # eager id-attach pass costs more than it saves there); the id
        # lands in the LAYOUT here, where the broadcast probe rides the
        # write plan's existing repartition pass for free
        p = p.join(F.broadcast(tables.term_dict), "term")
    (
        p.withColumn("bucket", term_bucket_expr(F.col("term"), cfg.term_buckets))
        .repartition(cfg.term_buckets, "bucket")
        .sortWithinPartitions("term", "doc_int")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, "postings"))
    )
    tables.docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
    tables.terms.write.mode("overwrite").parquet(os.path.join(out_dir, "terms"))
    if tables.term_dict is not None:
        tables.term_dict.write.mode("overwrite").parquet(
            os.path.join(out_dir, "term_dict"))
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(tables.stats, f, indent=2)


def read_index(spark: SparkSession, out_dir: str) -> IndexTables:
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    terms = spark.read.parquet(os.path.join(out_dir, "terms"))
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    td_dir = os.path.join(out_dir, "term_dict")
    term_dict = spark.read.parquet(td_dir) if os.path.isdir(td_dir) else None
    return IndexTables(postings=postings, docs=docs, terms=terms, stats=stats,
                       term_dict=term_dict)
