"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame/SQL plans (no per-row Python):

- exact:      sha256(content) groupBy — one shuffle, trivially scalable.
- ngram Jaccard: shingle -> inverted shingle index -> pair-generation
  WITHIN shingle buckets -> Jaccard from co-occurrence counts.  The
  classic |A∩B| / (|A|+|B|-|A∩B|) identity means we never materialize
  shingle sets per pair — only counts.  Pair blow-up is bounded by
  dropping ultra-common shingles (df cap), the standard trick at scale.
- MinHash + LSH: 60-bit portable shingle hashes -> H affine min-hashes
  (one groupBy with H min() aggregates — a single shuffle) -> band keys
  -> candidate pairs from band buckets (self-join within bucket) ->
  optional exact-Jaccard verify.
- SimHash: 64-bit sign-of-weighted-sum fingerprint; near-dups = equal
  fingerprints (or small Hamming distance via band rotation).
- embedding cosine near-dup: see similarity.py.

Each has an exact DuckDB oracle in entry_queries (same md5-based h60).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, functions as F

from ..analysis.analyzer import tokens_array_expr
from .hashing import MINHASH_P, h60, minhash_expr, minhash_params

log = logging.getLogger(__name__)

#: default skew guard: shingles shared by more docs than this are dropped
#: before PAIR GENERATION (sizes stay exact).  At web scale this is the
#: license-header / boilerplate killer — a shingle in 10k+ docs would fan
#: the self-join quadratically while carrying no near-dup signal.
DEFAULT_MAX_SHINGLE_DF = 10_000

#: default LSH band-bucket cap: a degenerate bucket of B ids produces
#: B*(B-1)/2 candidate pairs; beyond this size the bucket is dropped
#: (its members are byte-level near-identical and are better handled by
#: exact dedup upstream).
DEFAULT_MAX_BUCKET_SIZE = 1_000


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """-> (content_sha, n_docs, canonical_id): groups of byte-identical
    texts (n_docs >= 2); canonical = min id (the keep-one policy)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_sha"), F.col(id_col).alias("_id"))
        .groupBy("content_sha")
        .agg(F.count("*").alias("n_docs"), F.min("_id").alias("canonical_id"))
        .filter(F.col("n_docs") >= 2)
    )


def drop_duplicates_keep_canonical(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-dedup FILTER (the pipeline's consuming side of
    exact_duplicates): keep only the canonical (min-id) row per distinct
    content.  One groupBy for the canonical ids + one semi-join back —
    an anti/semi-join plan, no window sort over the corpus."""
    # NULL text: sha2(NULL) is NULL and a non-null-safe join would drop
    # EVERY null-text row (canonical included); the sentinel groups them
    # into one keep-one partition, matching SQL window-partition-by-NULL
    keyed = df.withColumn(
        "_sha", F.coalesce(F.sha2(F.col(text_col), 256), F.lit("__null_text__"))
    )
    keep = keyed.groupBy("_sha").agg(F.min(F.col(id_col)).alias(id_col))
    return keyed.join(keep, ["_sha", id_col], "leftsemi").drop("_sha")


def shingles_expr(text_col: Column, n: int) -> Column:
    """Word n-gram shingles as an array<string> (distinct not applied).

    Built by zip_with-chaining the token array with its own j-shifted
    slices (``shingle_i = toks[i] .. toks[i+n-1]`` space-joined): the
    per-element work is n-1 plain concats.  The previous
    ``transform(sequence) + slice + concat_ws`` form allocated a
    sub-array per shingle and measured 5x slower (600k-doc explode:
    27.6 s -> 4.3 s, identical arrays element-for-element — r7 A/B)."""
    toks = tokens_array_expr(text_col)
    length = F.size(toks)
    width = F.greatest(length - (n - 1), F.lit(0))
    out = F.slice(toks, 1, width)
    for j in range(1, n):
        out = F.zip_with(out, F.slice(toks, 1 + j, width),
                         lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(length < n, F.array().cast("array<string>")).otherwise(out)


def shingle_table(df: DataFrame, text_col: str, id_col: str, n: int,
                  distinct: bool = True) -> DataFrame:
    """-> (id, shingle) rows; DISTINCT by default (set semantics for
    Jaccard sizes/intersections).  Pass ``distinct=False`` for consumers
    that are duplicate-insensitive — min-hashing is (min over a multiset
    == min over its set).

    The distinct is ``array_distinct`` INSIDE each doc's shingle array
    before the explode — (id, shingle) uniqueness is a PER-DOC property,
    so paying a corpus-wide ``.distinct()`` exchange for it (the round-5
    plan) moved every shingle of every doc through a shuffle to dedup
    rows that only ever collide within one row's array.  Map-side only
    now."""
    arr = shingles_expr(F.col(text_col), n)
    if distinct:
        arr = F.array_distinct(arr)
    return df.select(F.col(id_col).alias("id"),
                     F.explode(arr).alias("shingle"))


def _capped_shingles(sh: DataFrame, max_shingle_df: int | None) -> DataFrame:
    """Drop shingles whose document frequency exceeds the cap (skew
    guard before any pair-generating self-join).  Filters by anti-join
    on the OVER-cap set — the small Zipf head — instead of semi-join on
    the huge under-cap tail: the anti side is broadcastable, so the big
    table never re-shuffles just to apply the cap."""
    if max_shingle_df is None:
        return sh
    over_cap = (
        sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
        .filter(F.col("sdf") > max_shingle_df)
        .select("shingle")
    )
    return sh.join(over_cap, "shingle", "left_anti")


def dropped_shingles(sh: DataFrame, max_shingle_df: int) -> DataFrame:
    """-> (shingle, sdf) of shingles the df cap removes — the
    observability side of the skew guard (log `.count()` of this when
    auditing a run; it is not computed on the hot path)."""
    return (
        sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
        .filter(F.col("sdf") > max_shingle_df)
    )


def _warn_dropped_shingles(op: str, sh: DataFrame, max_shingle_df: int) -> None:
    """Audit count for the df cap: WARN when it actually bound (reported
    jaccard becomes a lower bound and pairs can be silently lost)."""
    nd = dropped_shingles(sh, max_shingle_df).count()
    if nd:
        log.warning(
            "%s: max_shingle_df=%d dropped %d shingle(s) — reported "
            "jaccard is a lower bound for affected pairs",
            op, max_shingle_df, nd,
        )
    else:
        log.info("%s: max_shingle_df=%d dropped nothing", op, max_shingle_df)


def _jaccard_from_inter(inter: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    log_drops: bool = False,
) -> DataFrame:
    """-> (id_a, id_b, jaccard) for pairs above threshold (id_a < id_b).

    Count-based: sizes per doc, intersections from a self-join of the
    shingle table on shingle.  ``max_shingle_df`` (ON by default since
    r2 — see CHANGELOG) drops shingles shared by more than that many
    docs before pair generation — without it one boilerplate shingle
    makes the self-join quadratic in corpus size.  Sizes are computed on
    the UNCAPPED sets, so the reported jaccard is a (deterministic)
    lower bound when the cap binds; pass None to disable.
    ``log_drops`` runs the audit count and WARNS when the cap actually
    dropped shingles (an extra job — off on the hot path); use
    :func:`dropped_shingles` for the full audit frame."""
    sh = shingle_table(df, text_col, id_col, n)
    if log_drops and max_shingle_df is not None:
        _warn_dropped_shingles("ngram_jaccard_pairs", sh, max_shingle_df)
    sh_p = _capped_shingles(sh, max_shingle_df)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh_p.select(F.col("id").alias("id_a"), "shingle")
    b = sh_p.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold)


def jaccard_for_candidate_pairs(
    cand: DataFrame,
    sh: DataFrame,
    threshold: float,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact Jaccard restricted to candidate pairs (id_a, id_b) — NEVER a
    corpus-wide shingle self-join.  Cost is linear in
    Σ_candidates |shingles(id_a)|: fan each pair out by id_a's shingles,
    keep those also present for id_b via an equi-join on (id_b, shingle).
    This is the verify stage LSH exists to enable.

    The corpus-sized shingle table is cut down to CANDIDATE docs before
    anything else touches it (semi-join on the candidate id set — tiny
    relative to the corpus by LSH's design, so AQE broadcasts it): sizes,
    the df-cap filter, and both intersection probes then operate on
    |candidate docs| × |shingles/doc| rows, not |corpus| × |shingles/doc|.
    The one remaining corpus-wide aggregation is the df-cap's OVER-cap
    shingle set (global df is a corpus property), which is the small Zipf
    head by construction and anti-joins against the restricted table.
    Measured at 600k docs / 36k candidates: 374 s -> 120 s standalone
    (the remainder is the df-cap's one corpus pass; pass a materialized
    ``sh`` to eliminate it — see minhash_lsh_dedup's ``shingles``)."""
    ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # the restricted table feeds THREE consumers (sizes + both
    # intersection probes); the explicit repartition pins a shuffle
    # boundary that exchange-reuse dedups, so the scan+tokenize+shingle
    # work upstream runs ONCE instead of once per consumer (measured:
    # 3 redundant corpus passes without it) — plan-native, no cache
    # side effects to leak
    sh_c = sh.join(ids, "id", "leftsemi").repartition("id")
    sizes = sh_c.groupBy("id").agg(F.count("*").alias("sz"))
    if max_shingle_df is not None:
        over_cap = (
            sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("shingle")
        )
        sh_p = sh_c.join(over_cap, "shingle", "left_anti")
    else:
        sh_p = sh_c
    a = sh_p.select(F.col("id").alias("id_a"), "shingle")
    b = sh_p.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cand.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: -> (id, n_overlap, n_shingles,
    overlap_frac) for every TRAIN doc sharing at least one word n-gram
    with any EVAL doc (the n-gram-collision test LLM data pipelines run
    before training so eval answers don't leak into the mix; n=8-13 is
    the conventional window).

    Scale shape: the eval side is an evaluation benchmark — KB-to-MB
    against a 100-TB train corpus — so its DISTINCT shingle set is
    broadcast into a hash join against the train shingle stream.  The
    train side is one shingle explode + two aggregations on the same
    (id) key; the eval side never shuffles the corpus.  ``n_shingles``
    counts the doc's distinct shingles, so ``overlap_frac`` is the
    contaminated fraction of the doc's own n-gram set (1.0 = every
    n-gram of the doc appears somewhere in the eval set)."""
    ev = (
        shingle_table(eval_df, text_col, id_col, n)
        .select("shingle").distinct()
    )
    tr = shingle_table(train, text_col, id_col, n)
    sizes = tr.groupBy("id").agg(F.count("*").alias("n_shingles"))
    hits = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        hits.join(sizes, "id")
        .select(
            "id",
            "n_overlap",
            "n_shingles",
            (F.col("n_overlap") / F.col("n_shingles")).alias("overlap_frac"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    seed: int = 42,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """-> (id, mh_0..mh_{H-1}): one groupBy with H min() aggregates.
    The shingle stream is NOT deduplicated first — min() is
    duplicate-insensitive, so the plan is explode -> one partial+final
    aggregation, no distinct shuffle.

    Why explode+groupBy and not row-local ``array_min(transform(...))``
    (which looks shuffle-free): a doc's shingles stay in one task, so
    the partial aggregation collapses each doc to ONE row before the
    exchange — the "shuffle" moves |docs| combined rows, not
    |docs|×|shingles|, and is negligible.  The row-local variant was
    tried (round 6) and measured 8× SLOWER: CollapseProject inlines the
    shared per-shingle h60 array into each of the H signature
    expressions, recomputing the md5 H times per shingle.  The explode
    plan computes h60 exactly once per shingle.

    ``shingles``: optional pre-built (id, shingle) table to read instead
    of re-tokenizing (distinct or not — min() is insensitive); see
    :func:`minhash_lsh_dedup`."""
    sh = (shingles if shingles is not None
          else shingle_table(df, text_col, id_col, n, distinct=False)
          ).withColumn("h", h60(F.col("shingle")))
    params = minhash_params(num_hashes, seed)
    aggs = [
        F.min(minhash_expr(F.col("h"), a, b)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """-> (id_a, id_b, n_bands): pairs sharing >=1 LSH band.

    band key = concat of the band's signature components; self-join per
    band bucket, deduped across bands with a count of matching bands.
    ``max_bucket_size`` (ON by default) drops band buckets with more
    members than the cap before the self-join — a degenerate bucket of B
    near-identical docs would otherwise emit B²/2 pairs.  Dropped-bucket
    members are exact-dedup territory, not LSH's job; audit with
    :func:`oversized_buckets`.

    The signature table is EAGERLY localCheckpoint-ed first: the band
    loop references it 2×bands times (bucket-size gate + banded rows per
    band), and without a materialization barrier every reference inlines
    the whole upstream plan — measured at 600k docs, the un-truncated
    funnel plan held ~450 copies of the corpus scan (runtime exchange
    reuse deduped only some, and planning itself goes superlinear in
    plan size).  Signatures are |docs| × (H+1) int64s — tiny relative to
    the corpus — so the barrier costs one small write, same pattern as
    connected_components' per-round checkpoint."""
    signatures = signatures.localCheckpoint(eager=True)
    # ALL bands in one frame keyed (band, bkey): one bucket-size gate,
    # one self-join, one pair aggregation — vs the per-band loop's
    # ``bands`` separate gate+join subplans (measured r7 at 600k docs:
    # 7.9 s / 19 jobs -> one-join shape, same pair set; per-band
    # equality is preserved because ``band`` rides in the join key)
    banded = signatures.select(
        F.col("id"),
        F.posexplode(F.array(*[_band_key(b, rows_per_band)
                               for b in range(bands)])).alias("band", "bkey"),
    )
    if max_bucket_size is not None:
        ok = banded.groupBy("band", "bkey").agg(F.count("*").alias("bsz")).filter(
            F.col("bsz") <= max_bucket_size
        )
        banded = banded.join(ok.select("band", "bkey"), ["band", "bkey"], "leftsemi")
    l = banded.select(F.col("id").alias("id_a"), "band", "bkey")
    r = banded.select(F.col("id").alias("id_b"), "band", "bkey")
    allp = (
        l.join(r, ["band", "bkey"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return allp.groupBy("id_a", "id_b").agg(F.count("*").alias("n_bands"))


def _band_key(band: int, rows_per_band: int) -> Column:
    cols = [F.col(f"mh_{band * rows_per_band + r}") for r in range(rows_per_band)]
    return F.concat_ws("_", *[c.cast("string") for c in cols]).alias("bkey")


def oversized_buckets(
    signatures: DataFrame, bands: int, rows_per_band: int, max_bucket_size: int
) -> DataFrame:
    """-> (band, bkey, bsz) of band buckets the cap drops (observability)."""
    frames = []
    for b in range(bands):
        frames.append(
            signatures.select(F.lit(b).alias("band"), _band_key(b, rows_per_band))
            .groupBy("band", "bkey")
            .agg(F.count("*").alias("bsz"))
            .filter(F.col("bsz") > max_bucket_size)
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    seed: int = 42,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    log_drops: bool = False,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Full pipeline: signatures -> band candidates (bucket-capped) ->
    exact-Jaccard verify RESTRICTED TO THE CANDIDATES ->
    (id_a, id_b, jaccard >= threshold).

    The verify stage never self-joins the shingle table corpus-wide
    (that would be the all-pairs explosion LSH exists to avoid); it fans
    only the LSH candidate pairs out by their shingles
    (:func:`jaccard_for_candidate_pairs`).  ``log_drops`` runs the two
    observability queries (extra jobs — off on the hot path).

    ``shingles``: optional PRE-BUILT distinct shingle table
    (:func:`shingle_table` with ``distinct=True``).  Tokenize+shingle
    is the pipeline's dominant CPU (measured ~52 s/pass at 600k docs)
    and the plan references it from the signature, df-cap, and verify
    subtrees across MULTIPLE actions — pass it materialized
    (``shingle_table(...).localCheckpoint(eager=True)``) so every
    consumer reads rows instead of re-tokenizing the corpus; see
    bench.py's curation funnel (600k docs: 1559 s -> 167 s end-to-end
    with this plus the internal signature/candidate barriers).  This
    function itself never caches what it builds."""
    rows_per_band = num_hashes // bands
    sh = shingles if shingles is not None else shingle_table(df, text_col, id_col, n)
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes, seed,
                              shingles=sh)
    # candidate pairs are referenced twice downstream (the id
    # restriction set + the intersection probe) and are tiny; the
    # barrier stops the band self-joins from re-running per reference
    # (lsh_candidate_pairs checkpoints the signatures for the same
    # reason — see its docstring for the measured plan blow-up)
    cand = lsh_candidate_pairs(sigs, bands, rows_per_band, max_bucket_size)
    cand = cand.localCheckpoint(eager=True)
    if log_drops:
        if max_shingle_df is not None:
            _warn_dropped_shingles("minhash_lsh_dedup", sh, max_shingle_df)
        if max_bucket_size is not None:
            nb = oversized_buckets(sigs, bands, rows_per_band, max_bucket_size).count()
            if nb:
                log.warning(
                    "minhash_lsh_dedup: max_bucket_size=%d dropped %d band "
                    "bucket(s) — their members' near-dup pairs are NOT "
                    "reported (exact-dedup them upstream)", max_bucket_size, nb)
            else:
                log.info("minhash_lsh_dedup: bucket cap %d dropped nothing", max_bucket_size)
    return jaccard_for_candidate_pairs(cand, sh, threshold, max_shingle_df)


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 60) -> DataFrame:
    """-> (id, simhash): sign of per-bit tf-weighted sums of token h60
    hashes.  h60 provides exactly 60 usable bits — bits above 59 would be
    constant-sign noise (and 1<<63 overflows LongType), hence the cap."""
    if not 1 <= bits <= 60:
        raise ValueError(f"simhash bits must be in [1, 60] (h60 hash), got {bits}")
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens_array_expr(F.col(text_col))).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", h60(F.col("tok")))
    )
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"s_{j}")
            for j in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(F.col(f"s_{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("id", fp.alias("simhash"))


def _simhash_band_bounds(bits: int, n_bands: int) -> list[tuple[int, int]]:
    """(shift, width) per band; earlier bands get the base width, the
    last band absorbs the remainder — deterministic, mirrored in SQL."""
    w = bits // n_bands
    bounds = []
    for b in range(n_bands):
        shift = b * w
        width = w if b < n_bands - 1 else bits - shift
        bounds.append((shift, width))
    return bounds


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 16,
    max_hamming: int = 2,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """-> (id_a, id_b, hamming <= max_hamming), id_a < id_b — near-dups
    by SimHash Hamming distance WITHOUT an all-pairs comparison.

    Pigeonhole blocking: the fingerprint splits into ``max_hamming + 1``
    bit bands; two fingerprints within distance d MUST agree exactly on
    at least one band, so candidates come from per-band equality
    self-joins (a hash shuffle per band), verified by
    ``bit_count(a XOR b)``.  ``max_bucket_size`` caps degenerate band
    buckets exactly like LSH banding (members of a dropped bucket are
    exact-dedup territory)."""
    n_bands = max_hamming + 1
    if bits < n_bands:
        raise ValueError(f"need bits >= max_hamming+1 bands ({n_bands}), got {bits}")
    # barrier: the band loop references the fingerprint table 3× per
    # band (bucket gate + both join sides) — without it each reference
    # inlines the full simhash aggregation plan (same plan blow-up as
    # lsh_candidate_pairs; fingerprints are |docs| × 2 int64s, tiny)
    sh = simhash(df, text_col, id_col, bits).localCheckpoint(eager=True)
    frames = []
    for shift, width in _simhash_band_bounds(bits, n_bands):
        mask = (1 << width) - 1
        banded = sh.select(
            "id", "simhash",
            (F.shiftright(F.col("simhash"), shift).bitwiseAND(F.lit(mask))).alias("bkey"),
        )
        if max_bucket_size is not None:
            ok = banded.groupBy("bkey").agg(F.count("*").alias("n")).filter(
                F.col("n") <= max_bucket_size
            )
            banded = banded.join(ok.select("bkey"), "bkey", "leftsemi")
        l = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"), "bkey")
        r = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"), "bkey")
        frames.append(
            l.join(r, "bkey").filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "ha", "hb")
        )
    allp = frames[0]
    for f in frames[1:]:
        allp = allp.unionByName(f)
    return (
        allp.distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


def simhash_duplicate_groups(df: DataFrame, text_col: str, id_col: str,
                             bits: int = 32) -> DataFrame:
    """-> (simhash, n_docs, canonical_id): exact-fingerprint collisions."""
    sh = simhash(df, text_col, id_col, bits)
    return (
        sh.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("canonical_id"))
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# duplicate clusters: connected components over near-dup pairs
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    edge_storage: "StorageLevel | None" = None,
) -> DataFrame:
    """(id_a, id_b) near-dup pairs -> (id, component) where component is
    the MINIMUM id reachable through the pair graph — the duplicate-
    CLUSTER assignment a training-data pipeline needs on top of pairwise
    near-dup output (keep one doc per component, drop the rest).

    Min-label propagation WITH pointer jumping: each round takes
    ``label(v) <- min(label(v), min_{u~v} label(u))`` and then replaces
    every label by ITS OWN label (``component <- label(component)``, the
    path-halving step) — so convergence is O(log n) rounds even on a
    long chain, not O(diameter).  The fixpoint is checked with a 1-row
    changed-count aggregate per round (same driver-scalar convergence
    pattern as pagerank) and non-convergence within ``max_iters``
    RAISES rather than silently returning partial labels (a wrong
    component map would make a dedup pipeline keep duplicates).

    Deterministic: the fixpoint is unique regardless of execution order.

    ``edge_storage`` controls where the (reused-every-round) undirected
    edge set lives: default MEMORY_AND_DESER cache; pass
    ``StorageLevel.DISK_ONLY`` when the pair set is a large fraction of
    executor memory (dedup over billions of near-dup pairs) — each
    round re-reads it, so spilling it to disk trades one sequential
    read per round for not evicting the shuffle working set.
    """
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    und = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = und.persist(edge_storage) if edge_storage is not None else und.cache()
    labels = (
        und.select(F.col("a").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .cache()
    )
    if labels.count() == 0:
        # empty pair graph (a clean corpus): trivially converged —
        # skip the iteration machinery (each round costs joins + an
        # eager localCheckpoint + a count even on zero rows).  The
        # checkpoint TRUNCATES lineage like the loop would have:
        # without it, downstream consumers would recompute the entire
        # (possibly expensive) pair pipeline just to rediscover
        # emptiness.
        out = labels.localCheckpoint(eager=True)
        und.unpersist()
        labels.unpersist()
        return out
    converged = False
    for _ in range(max_iters):
        neigh = (
            und.join(labels.select(F.col("id").alias("b"),
                                   F.col("component").alias("_nc")), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("_nc").alias("_mn"))
        )
        stepped = (
            labels.join(neigh, "id", "left")
            .select("id", F.least(F.col("component"),
                                  F.coalesce(F.col("_mn"), F.col("component")))
                    .alias("component"))
        )
        # pointer jumping: component <- label(component).  Labels are
        # always ids of real nodes, so the self-join below is total.
        jump = stepped.select(F.col("id").alias("_jid"),
                              F.col("component").alias("_jc"))
        # localCheckpoint TRUNCATES the logical plan each round: the
        # self-join doubles lineage per iteration, and re-analyzing the
        # compounding plan makes round time grow exponentially (measured
        # 2s -> 70s by round 5 with cache() alone).  Same role as the
        # periodic checkpoint in pagerank.py.
        nxt = (
            stepped.join(jump, stepped["component"] == jump["_jid"], "left")
            .select("id",
                    F.coalesce(F.col("_jc"), F.col("component")).alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.join(labels.select(F.col("id"),
                                   F.col("component").alias("_old")), "id")
            .filter(F.col("component") != F.col("_old"))
            .count()
        )
        labels.unpersist()
        labels = nxt
        if changed == 0:
            converged = True
            break
    und.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"(pointer jumping makes this ~2^{max_iters} path length — "
            "the input is pathological; raise max_iters explicitly)"
        )
    return labels


def paragraph_dedup(
    paras: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "para_idx",
    text_col: str = "para_text",
) -> DataFrame:
    """Paragraph-level exact dedup over an exploded (doc, para_idx,
    para_text) table: mark every paragraph whose exact text already
    occurred at a smaller (doc, para_idx) — the first occurrence
    corpus-wide is canonical, every later copy is a duplicate.  This is
    the paragraph-granularity form of exact substring dedup used for
    LLM training corpora (boilerplate headers/footers/navigation repeat
    across millions of pages while the surrounding docs are unique, so
    doc-level dedup never catches them; cf. Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better").

    -> input columns + ``is_dup boolean``.

    Plan: ONE shuffle on sha256(para_text) computing the canonical
    (min struct(doc, idx)) per distinct paragraph — partial-aggregable,
    so a boilerplate paragraph repeated on 10^9 pages still map-side
    combines to one row per task before the exchange — then a
    broadcast-eligible join back.  No windows over the full corpus, no
    per-group task (the skewed-key failure mode of rank-based dedup).
    """
    pid = F.sha2(F.col(text_col).cast("binary"), 256)
    canon = (
        paras.groupBy(pid.alias("_pid"))
        .agg(F.min(F.struct(F.col(id_col), F.col(idx_col))).alias("_first"))
    )
    out = (
        paras.join(canon, pid == F.col("_pid"), "inner")
        .withColumn(
            "is_dup",
            ~((F.col(id_col) == F.col(f"_first.{id_col}"))
              & (F.col(idx_col) == F.col(f"_first.{idx_col}"))),
        )
        .drop("_pid", "_first")
    )
    return out


def paragraph_dedup_stats(
    paras: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "para_idx",
    text_col: str = "para_text",
) -> DataFrame:
    """Per-doc paragraph-duplication profile from paragraph_dedup:
    -> (id_col, n_paras, n_dup_paras, dup_ratio) where dup_ratio is
    rounded to 4 places.  A doc made mostly of corpus-wide boilerplate
    scores high and is a removal candidate for a curation pipeline."""
    marked = paragraph_dedup(paras, id_col, idx_col, text_col)
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paras"),
            F.sum(F.col("is_dup").cast("long")).cast("long").alias("n_dup_paras"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_paras") / F.col("n_paras"), 4),
        )
    )
