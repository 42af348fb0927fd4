"""Distribution statistics, distinct-count sketching, and deterministic
dataset splitting — the statistics layer of a training-data pipeline.

- ``group_quantiles``: exact linear-interpolation quantiles per group
  (Spark's ``percentile`` — identical interpolation to DuckDB's
  ``quantile_cont``, verified by the oracle gate).  Exact quantiles
  shuffle each group's values once; at 100 TB switch the same call site
  to ``percentile_approx`` (t-digest, mergeable partial aggregates) —
  the output contract is unchanged.
- ``kmv_distinct``: K-Minimum-Values distinct-count sketch on the
  portable 60-bit hash.  DETERMINISTIC (no RNG, no HLL register noise),
  so the estimate itself is oracle-gateable — the teaching/verification
  twin of ``approx_count_distinct`` (HLL++), which production uses when
  cross-engine exactness isn't required.  Estimator: with U the k-th
  smallest of n >= k distinct hash values scaled to (0,1),
  E[distinct] = (k-1)/U (Bar-Yossef et al. 2002); below k distinct
  values the exact count is returned.
- ``hash_split``: train/validation/test assignment by hash RANGE over a
  stable key — the reproducible, join-free way to split a corpus that
  keeps a document's split stable as the corpus grows (no shuffle at
  all: a pure column expression usable as a partition column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .hashing import h60

#: h60 produces values in [0, 2^60)
H60_SPACE = float(1 << 60)


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """-> one row per group with exact interpolated quantiles q_<pct>."""
    aggs = [
        F.expr(f"percentile({value_col}, {q})").alias(f"q_{int(q * 100)}")
        for q in qs
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 32,
    prefilter_factor: int = 8,
) -> DataFrame:
    """-> (group..., n_exact_or_k, kmv_estimate): per group, the KMV
    distinct estimate of ``key_col`` (exact when the group has < k
    distinct keys).

    Scale shape: the k-th smallest hash is found WITHOUT sorting each
    group's full hash set through one window partition.  Distinct
    counts per group come from one aggregate; hashes are then
    pre-filtered to ``h <= prefilter_factor * k/n * 2^60`` — under the
    (cryptographic-hash) uniformity KMV itself relies on, the k
    smallest sit far below that threshold, so the per-group window runs
    over ~factor*k rows instead of n.  The filter is VERIFIED, not
    trusted: any group whose kept-count falls below min(k, n) raises
    (never a silently wrong estimate); at factor 8 the failure odds per
    group are exp(-Θ(k)) — never observed in practice."""
    hashed = (
        df.select(*group_cols, h60(F.col(key_col).cast("string")).alias("_h"))
        .distinct()
    )
    counts = hashed.groupBy(*group_cols).agg(F.count("*").alias("_n"))
    thresh = F.when(
        F.col("_n") > prefilter_factor * k,
        (F.lit(float(prefilter_factor * k)) / F.col("_n") * F.lit(H60_SPACE)).cast("long"),
    ).otherwise(F.lit((1 << 60) - 1))
    small = (
        hashed.join(F.broadcast(counts.withColumn("_t", thresh)), group_cols)
        .filter(F.col("_h") <= F.col("_t"))
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    ranked = small.withColumn("_rn", F.row_number().over(w))
    per_group = ranked.groupBy(*group_cols, "_n").agg(
        F.count("*").alias("_kept"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_kth"),
    )
    # deterministic IN-PLAN guard (no extra driver job, no double
    # execution): if the prefilter kept fewer than min(k, n) rows for
    # any group the job FAILS loudly instead of emitting a wrong k-th min
    est_ok = F.when(
        F.col("_n") >= k,
        (F.lit(float(k - 1)) / (F.col("_kth") / F.lit(H60_SPACE))),
    ).otherwise(F.col("_n").cast("double"))
    est = F.when(
        F.col("_kept") >= F.least(F.lit(k), F.col("_n")), est_ok
    ).otherwise(F.expr(
        f"raise_error('kmv_distinct prefilter kept too few hashes — "
        f"raise prefilter_factor (current {prefilter_factor})')"
    ).cast("double"))
    return per_group.select(
        *group_cols,
        F.least(F.col("_n"), F.lit(k)).cast("long").alias("n_seen_capped"),
        F.round(est, 4).alias("kmv_estimate"),
    )


def split_expr(key: Column, weights: dict[str, float]) -> Column:
    """CASE expression assigning a split label by h60(key) range.
    ``weights`` = {label: fraction}; fractions must sum to <= 1 (any
    remainder falls into the LAST label)."""
    expr = None
    cum = 0.0
    labels = list(weights.items())
    h = h60(key.cast("string"))
    for label, frac in labels[:-1]:
        cum += frac
        cond = h < F.lit(int(cum * H60_SPACE))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = labels[-1][0]
    return (expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)).alias("split")


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Attach a deterministic ``split`` column (train/val/test by
    default, 0.8/0.1/0.1).  Pure column expression — rows keep their
    split forever regardless of corpus growth or partitioning."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn("split", split_expr(F.col(key_col), weights))


def quality_stratified_sample(
    scored: DataFrame,
    rates: dict[int, float],
    id_col: str = "id",
    score_col: str = "score",
    salt: str = "qsamp",
) -> DataFrame:
    """Deterministic quality-stratified sampling — the training-mix
    construction step: keep each document with a per-stratum rate
    (e.g. keep all of the top quality band, 2% of the bottom), decided
    by a salted md5 hash of the id — NO RNG state, so the sample is
    reproducible across runs, partitionings, and corpus growth (a doc's
    fate never changes), and different ``salt`` values draw independent
    samples.

    ``scored`` carries a quantized quality score (quality_score's
    0/0.25/…/1.0 bands); ``rates`` maps band index (round(score·4) →
    0..4) to a keep fraction.  Stratifying on the VALUE (not a rank
    window) keeps this a pure column expression — no global ntile, no
    shuffle, survives any corpus size.
    """
    band = F.round(F.col(score_col) * 4).cast("int")
    # Fold init is DROP (rate 0): a band missing from ``rates`` — or a
    # NULL score — keeps nothing, matching the oracle's CASE ... ELSE 0.
    rate = F.lit(0)
    for b, r in sorted(rates.items()):
        thr = F.lit(int(round(r * 1_000_000)))
        rate = F.when(band == b, thr).otherwise(rate)
    u = h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % F.lit(1_000_000)
    return scored.filter(u < rate)


def mix_report(
    df: DataFrame,
    dims: list[str],
    text_col: str = "text",
    all_label: str = "<all>",
) -> DataFrame:
    """Curation mix report: ROLLUP over ``dims`` (e.g. source, lang)
    with doc / whitespace-token / char totals per group plus each
    subtotal level — the composition summary a training-mix run ships
    with its output (what fraction of the mix is which source, in docs
    and in tokens).

    Scale shape: one pass, map-side partial aggregation; the result is
    ~the product of dim cardinalities regardless of corpus size.
    Rolled-up dimension slots render as ``all_label`` (the corpus has no
    NULL dims; coalesce is applied identically engine- and oracle-side
    so parity holds either way)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))
    base = df.select(
        *dims,
        ws.cast("long").alias("_toks"),
        F.length(t).cast("long").alias("_chars"),
    )
    out = base.rollup(*dims).agg(
        F.count("*").alias("n_docs"),
        F.sum("_toks").alias("n_tokens"),
        F.sum("_chars").alias("n_chars"),
    )
    return out.select(
        *[F.coalesce(F.col(d), F.lit(all_label)).alias(d) for d in dims],
        "n_docs", "n_tokens", "n_chars",
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_by: list,
    k: int,
    id_col: str = "id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-group top-``k`` cap with a skew-safe two-phase plan — the
    per-domain cap step of a web-scale curation pipeline (no single
    source/domain may dominate the training mix).

    ``order_by`` is a list of Columns defining a TOTAL order (tie-break
    on a unique id) so the result is deterministic and identical to the
    naive single-window ``row_number() <= k``.

    Scale shape: a plain window over ``group_col`` puts an entire
    group in ONE task — a hot domain with 10^9 rows is a straggler or
    an OOM.  Phase 1 ranks within (group, salt) where salt =
    h60(id) % salt_buckets, keeping <= salt_buckets * k rows per group
    (bounded, whatever the group size); phase 2 re-ranks only those
    survivors per group.  Because the order is total, discarding rows
    ranked > k within any salt bucket can never discard a global
    top-k row.  -> input columns + ``rank`` (1..k per group).
    """
    from .hashing import h60 as _h60  # local: avoid cycle at import time

    salt = (_h60(F.col(id_col).cast("string")) % F.lit(salt_buckets)).alias("_salt")
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order_by)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def pack_stream(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    num_ranges: int | None = None,
) -> DataFrame:
    """Token-budget packing — place every document's token span in the
    single concatenated training stream (deterministic ``id_col``
    order): ``bin = cum_excl // budget``, ``bin_offset = cum_excl %
    budget`` where ``cum_excl`` is the EXCLUSIVE prefix sum of
    ``token_col``.  Documents may span bin boundaries (the standard
    concat-then-chunk packing for fixed-context training), so the
    assignment is a pure function of the prefix sum — no sequential
    greedy state.

    -> input columns + (cum_excl, bin, bin_offset).

    Scale shape: a naive ``sum() over (order by id)`` is an Exchange
    SinglePartition — the whole corpus through one task.  This is the
    same two-phase scheme as the builder's dense-id assignment
    (index/builder.assign_dense_ids): range-partition by id, LOCAL
    cumulative sum per partition, then add per-partition token-total
    offsets from a tiny P-row driver job.  Concatenating range
    partitions in partition order is the global id order, so
    ``offset[pid] + local_cum`` IS the global exclusive prefix sum.
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    if num_ranges is None:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(num_ranges, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # persisted for the same reason as assign_dense_ids: the sampled
    # range boundaries (hence _pid) must be identical between the
    # offsets job and the output
    local = ranged.withColumn(
        "_lcum", F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    ).persist(StorageLevel.DISK_ONLY)
    sums = {
        r["_pid"]: r["s"]
        for r in local.groupBy("_pid")
        .agg(F.sum(token_col).cast("long").alias("s"))
        .collect()
    }
    if not sums:
        return (
            local.withColumn("cum_excl", F.lit(None).cast("long"))
            .withColumn("bin", F.lit(None).cast("long"))
            .withColumn("bin_offset", F.lit(None).cast("long"))
            .drop("_pid", "_lcum")
        )
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    cum = (off_map[F.col("_pid")] + F.col("_lcum")).cast("long")
    return (
        local.withColumn("cum_excl", cum)
        # integer `div`, not floor(double/…): a 100 TB stream's token
        # count can exceed 2^53 and double division would misbin
        .withColumn("bin", F.expr(f"cum_excl div {int(budget)}").cast("long"))
        .withColumn("bin_offset", (F.col("cum_excl") % budget).cast("long"))
        .drop("_pid", "_lcum")
    )
