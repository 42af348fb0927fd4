"""Gradeable queries: end-to-end retrieval evaluation (AP/nDCG — R9),
tumbling-window event aggregation, rollup aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import entry_queries as EQ
from .entry_batch import SQL_BATCH_BM25, _batch_terms_df, BATCH_K
from .evaluation.metrics import evaluate
from .query.batch import batch_bm25_search

#: eval over the batch query set, minus the no-hit query (qid 4) so the
#: engine and the oracle trivially cover the same qid set
EVAL_QIDS = (1, 2, 3, 5)

#: deterministic qrels: relevance = 1 iff (doc_id*3 + qid*17) % 10 < 3,
#: restricted to doc_id < 200 — same expression on both sides
QRELS_WHERE = "(doc_id * 3 + qid * 17) % 10 < 3"


def _qrels(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = EQ.load_documents(spark, sf_dir).select("doc_id").filter("doc_id < 200")
    qids = spark.createDataFrame([(q,) for q in EVAL_QIDS], "qid long")
    return qids.crossJoin(docs).withColumn(
        "relevance",
        ((F.col("doc_id") * 3 + F.col("qid") * 17) % 10 < 3).cast("int"),
    )


def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ix = EQ.get_index(spark, sf_dir)
    qt = _batch_terms_df(spark).filter(F.col("qid").isin(*EVAL_QIDS))
    results = batch_bm25_search(ix, qt, k=BATCH_K, cfg=EQ.NOSTEM_CFG).select(
        "qid", "doc_id", "score"
    )
    out = evaluate(results, _qrels(spark, sf_dir))
    return out.select(
        F.round("mean_ap", 4).alias("mean_ap"),
        F.round("min_ap", 4).alias("min_ap"),
        F.round("max_ap", 4).alias("max_ap"),
        F.round("mean_ndcg", 4).alias("mean_ndcg"),
        F.round("min_ndcg", 4).alias("min_ndcg"),
        F.round("max_ndcg", 4).alias("max_ndcg"),
    )


def _sql_eval_chain() -> str:
    """Shared CTE chain ``WITH results ... j(qid, ap, ndcg)`` — the
    route-free batch-BM25 retrieval joined with the deterministic qrels,
    windowed into per-query AP/nDCG.  Finals: _sql_eval_metrics
    (min/max/mean summary) and _sql_batch_eval_summary (per-query rows;
    the engine side routes WAND/exhaustive, which is value-invisible)."""
    qid_list = ", ".join(str(q) for q in EVAL_QIDS)
    batch = SQL_BATCH_BM25.strip().rstrip()
    return f"""
WITH results AS (
  SELECT qid, doc_id, rank, score FROM ({batch}) WHERE qid IN ({qid_list})
),
qrels AS (
  SELECT q.qid, d.doc_id,
         CASE WHEN (d.doc_id * 3 + q.qid * 17) % 10 < 3 THEN 1 ELSE 0 END AS relevance
  FROM (SELECT unnest([{qid_list}]) AS qid) q
  CROSS JOIN (SELECT doc_id FROM documents WHERE doc_id < 200) d
),
ranked AS (
  SELECT r.qid, r.doc_id,
         row_number() OVER (PARTITION BY r.qid ORDER BY r.score DESC, r.doc_id ASC) AS rank,
         coalesce(qr.relevance, 0) AS rel
  FROM results r LEFT JOIN qrels qr ON qr.qid = r.qid AND qr.doc_id = r.doc_id
),
prec AS (
  SELECT qid, rank, rel,
         sum(rel) OVER (PARTITION BY qid ORDER BY rank) * 1.0 / rank AS p_at
  FROM ranked
),
ap AS (
  SELECT p.qid, sum(p.p_at * p.rel) / t.n_rel AS ap
  FROM prec p
  JOIN (SELECT qid, count(*) AS n_rel FROM qrels WHERE relevance > 0 GROUP BY qid) t
    ON t.qid = p.qid
  GROUP BY p.qid, t.n_rel
),
dcg AS (
  SELECT qid, sum((pow(2.0, rel) - 1) / (ln(rank + 1) / ln(2))) AS dcg
  FROM ranked GROUP BY qid
),
ideal AS (
  SELECT qid, relevance,
         row_number() OVER (PARTITION BY qid ORDER BY relevance DESC, doc_id ASC) AS irank
  FROM qrels
),
idcg AS (
  SELECT qid, sum((pow(2.0, relevance) - 1) / (ln(irank + 1) / ln(2))) AS idcg
  FROM ideal GROUP BY qid
),
j AS (
  SELECT a.qid, a.ap,
         CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg ELSE 0 END AS ndcg
  FROM ap a JOIN dcg d USING (qid) JOIN idcg i USING (qid)
)"""


def _sql_eval_metrics() -> str:
    return f"""{_sql_eval_chain()}
SELECT round(avg(ap), 4) AS mean_ap, round(min(ap), 4) AS min_ap,
       round(max(ap), 4) AS max_ap,
       round(avg(ndcg), 4) AS mean_ndcg, round(min(ndcg), 4) AS min_ndcg,
       round(max(ndcg), 4) AS max_ndcg
FROM j
"""


def _sql_batch_eval_summary() -> str:
    return f"""{_sql_eval_chain()}
SELECT CAST(qid AS BIGINT) AS qid, round(ap, 4) AS ap, round(ndcg, 4) AS ndcg,
       round(avg(ap) OVER (), 4) AS mean_ap,
       round(avg(ndcg) OVER (), 4) AS mean_ndcg
FROM j
"""


#: splits the eval qid set into mixed WAND/exhaustive routes at sf0.01
#: (same threshold as entry_graph.ROUTED_MIN_POSTINGS); both routes are
#: exact, so the oracle stays route-free
ROUTED_EVAL_MIN_POSTINGS = 400


def q_batch_eval_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's B2 golden run composed end-to-end (r5 verdict
    #5): ROUTED batch retrieval (route_batch_bm25 — one driver collect
    routes every query, WAND subset through one cogroup, the rest
    through one exhaustive batch join, Search_FR.java:994-1098 runs the
    same loop one query at a time) feeding qrels-joined per-query
    AP/nDCG in the same composed plan, with the suite mean carried
    in-plan as a window over the whole frame."""
    from pyspark.sql import Window

    from .entry_batch import get_blocks
    from .evaluation.metrics import per_query_eval
    from .query.wand import route_batch_bm25

    ix = EQ.get_index(spark, sf_dir)
    blocks, dlb = get_blocks(spark, sf_dir)
    qt = _batch_terms_df(spark).filter(F.col("qid").isin(*EVAL_QIDS))
    res, _routes = route_batch_bm25(
        ix, blocks, dlb, qt, k=BATCH_K, cfg=EQ.NOSTEM_CFG,
        block_span=256, wand_min_postings=ROUTED_EVAL_MIN_POSTINGS,
    )
    j = per_query_eval(res.select("qid", "doc_id", "score"),
                       _qrels(spark, sf_dir))
    w = Window.partitionBy(F.lit(1))
    return j.select(
        F.col("qid").cast("long").alias("qid"),
        F.round("ap", 4).alias("ap"),
        F.round("ndcg", 4).alias("ndcg"),
        # suite means from the UNROUNDED per-query values (a rounded
        # input would shift the mean at 4dp boundaries)
        F.round(F.avg("ap").over(w), 4).alias("mean_ap"),
        F.round(F.avg("ndcg").over(w), 4).alias("mean_ndcg"),
    )


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows per event_type (the batch analog of the
    streaming windowed aggregation)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        # day as STRING: date/timestamp dtypes stringify differently
        # across engines (datetime.date vs datetime64) and break the
        # order-insensitive value hash even when values agree
        ev.groupBy(
            F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            # EXACT integer cents (value is 2-decimal data): double
            # summation is order-dependent across engines, and Spark's
            # BigDecimal HALF_UP vs DuckDB's float floor(x*1e4+0.5)
            # disagree on exact .00005 boundaries — so both the sum AND
            # the 4-decimal avg rounding are done in BIGINT arithmetic
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias("_c"),
        )
        .select(
            "day", "event_type", "n_events",
            (F.col("_c") / F.lit(100.0)).alias("sum_value"),
            # half-up round of (cents*100 / n) at 4 decimals, in integers;
            # SIGN-SAFE: computed on abs then re-signed, because Spark's
            # `div` truncates toward zero while DuckDB's `//` floors —
            # they agree only on non-negative operands
            (F.expr("sign(_c) * ((abs(_c) * 200 + n_events) div (2 * n_events))")
             / F.lit(10000.0)).alias("avg_value"),
        )
    )


SQL_EVENTS_TUMBLING = """
WITH g AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, n_events,
       c / 100.0 AS sum_value,
       sign(c) * ((abs(c) * 200 + n_events) // (2 * n_events)) / 10000.0 AS avg_value
FROM g
"""


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )
    )


SQL_ROLLUP_PRICING = """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(l_extendedprice) AS DOUBLE), 4) AS sum_price
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join relational query (TPC-H Q5 family): lineitem ⋈ orders
    ⋈ customer ⋈ nation, revenue per (nation, order year).  The nation
    dimension is explicitly broadcast — the plan a 100-TB fact table
    wants (two shuffle joins on the fact keys, zero for the dim)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.count("*").alias("n_items"),
            # exact decimal arithmetic (2-decimal inputs) — see
            # events_tumbling for why double sums can't be oracle-gated
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
                      * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
                .cast("double"), 4,
            ).alias("revenue"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       CAST(count(*) AS BIGINT) AS n_items,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


def q_salted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-term-safe posting-array export (S5/S6 shape): two-level
    salted collect (partial arrays per (term, salt), merged per term).
    Gated by a POSITIONAL checksum over the final array — any wrong
    order, missing or duplicated posting changes it."""
    from .index.skew import salted_posting_arrays

    ix = EQ.get_index(spark, sf_dir)
    out = salted_posting_arrays(ix.postings)
    checksum = F.aggregate(
        F.zip_with(
            F.col("postings"),
            F.sequence(F.lit(1), F.size("postings")),
            lambda p, i: i.cast("long") * p["doc_int"],
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return out.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.size("postings").cast("long").alias("n"),
        checksum.alias("pos_checksum"),
    )


SQL_SALTED_POSTINGS = f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
rn AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS r
  FROM post
)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(r * doc_id) AS BIGINT) AS pos_checksum
FROM rn GROUP BY term
"""


SESSION_GAP_SEC = 1800


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the batch form of the custom stateful
    streaming operator in streaming/sessions.py)."""
    from .streaming.sessions import sessionize_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = sessionize_batch(ev, gap_sec=SESSION_GAP_SEC)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "session_start_us", "session_end_us", "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


SQL_SESSIONIZATION = f"""
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
f AS (
  SELECT *, CASE WHEN prev IS NULL OR us - prev > {SESSION_GAP_SEC} * 1000000
                 THEN 1 ELSE 0 END AS ns
  FROM o
),
sid AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(min(us) AS BIGINT) AS session_start_us,
       CAST(max(us) AS BIGINT) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_value
FROM sid GROUP BY user_id, sid
"""


PRK_K = 5


def q_eval_prk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@5 / recall@5 / MRR per query over the batch result set
    (the binary-metric complement of the AP/nDCG gate)."""
    from .evaluation.metrics import precision_recall_mrr

    ix = EQ.get_index(spark, sf_dir)
    qt = _batch_terms_df(spark).filter(F.col("qid").isin(*EVAL_QIDS))
    results = batch_bm25_search(ix, qt, k=BATCH_K, cfg=EQ.NOSTEM_CFG).select(
        "qid", "doc_id", "score"
    )
    out = precision_recall_mrr(results, _qrels(spark, sf_dir), k=PRK_K)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.round("p_at_k", 4).alias("p_at_k"),
        F.round("r_at_k", 4).alias("r_at_k"),
        F.round("rr", 4).alias("rr"),
    )


def _sql_eval_prk() -> str:
    # ranks come from the UNROUNDED shared batch CTE — re-ranking on
    # SQL_BATCH_BM25's rounded scores can swap near-tied docs vs the
    # engine's unrounded ordering (latent gate flake)
    from .entry_batch import sql_batch_results_cte

    qid_list = ", ".join(str(q) for q in EVAL_QIDS)
    return f"""
WITH {sql_batch_results_cte()},
qrels AS (
  SELECT q.qid, d.doc_id,
         CASE WHEN (d.doc_id * 3 + q.qid * 17) % 10 < 3 THEN 1 ELSE 0 END AS relevance
  FROM (SELECT unnest([{qid_list}]) AS qid) q
  CROSS JOIN (SELECT doc_id FROM documents WHERE doc_id < 200) d
),
ranked AS (
  SELECT r.qid, r.doc_id, r.rank, coalesce(qr.relevance, 0) AS rel
  FROM results r LEFT JOIN qrels qr ON qr.qid = r.qid AND qr.doc_id = r.doc_id
  WHERE r.qid IN ({qid_list})
),
hits AS (SELECT qid, sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits
         FROM ranked WHERE rank <= {PRK_K} GROUP BY qid),
fr AS (SELECT qid, min(rank) AS first_rank FROM ranked WHERE rel > 0 GROUP BY qid),
tot AS (SELECT qid, count(*) AS n_rel FROM qrels WHERE relevance > 0 GROUP BY qid),
base AS (SELECT DISTINCT qid FROM ranked)
SELECT CAST(b.qid AS BIGINT) AS qid,
       round(coalesce(h.hits, 0) * 1.0 / {PRK_K}, 4) AS p_at_k,
       round(CASE WHEN coalesce(t.n_rel, 0) > 0
                  THEN coalesce(h.hits, 0) * 1.0 / t.n_rel ELSE 0 END, 4) AS r_at_k,
       round(CASE WHEN f.first_rank IS NOT NULL THEN 1.0 / f.first_rank ELSE 0 END, 4) AS rr
FROM base b
LEFT JOIN hits h USING (qid) LEFT JOIN fr f USING (qid) LEFT JOIN tot t USING (qid)
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 family: selective dim filter -> two fact joins -> top-10
    by exact-decimal revenue.  The segment/date predicates push into the
    parquet scans; the broadcast goes to the filtered customer side."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    res = (
        F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter((F.col("o_orderdate") < "1998-01-01") & (F.col("l_shipdate") > "1998-01-01"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("l_orderkey"))
        .limit(10)
    )
    return res.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.round(F.col("_rev").cast("double"), 4).alias("revenue"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
    )


SQL_SHIPPING_PRIORITY = """
SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) DESC,
         l.l_orderkey ASC
LIMIT 10
"""


# --- temporal joins (as-of / range) -----------------------------------------

def _status_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dimension stream derived from events: every 7th
    event is a 'status change' (status = event_id % 5); deduped to one
    change per (user, ts) keeping the max event_id — the same rule the
    oracle applies, so ASOF tie-breaks are well-defined."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    st = ev.filter(F.col("event_id") % 7 == 0).select(
        "user_id", "ts", (F.col("event_id") % 5).alias("status"), "event_id"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        st.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "status")
    )


def q_asof_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event annotated with the user's most
    recent status change at or before the event (NULL before the
    first).  One window shuffle, no join node (temporal.asof_join)."""
    from .temporal import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id"
    )
    out = asof_join(ev, _status_changes(spark, sf_dir), on="user_id",
                    value_cols=["status"])
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("status").cast("long").alias("status"),
    )


SQL_ASOF_STATUS = """
WITH status AS (
  SELECT user_id, ts, status FROM (
    SELECT user_id, ts, event_id % 5 AS status,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_id % 7 = 0) WHERE rn = 1
)
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       CAST(s.status AS BIGINT) AS status
FROM events e ASOF LEFT JOIN status s
  ON e.user_id = s.user_id AND e.ts >= s.ts
"""

#: deterministic OVERLAPPING intervals covering the events value range
RANGE_INTERVALS = [(k, 30.0 * k, 30.0 * k + 45.0) for k in range(17)]
RANGE_BUCKET_WIDTH = 10.0


def q_range_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (lo <= value < hi, overlapping intervals) executed
    as a bucketized EQUI-join — a hash join on floor(value/width), never
    a per-row nested-loop interval scan (temporal.range_join_buckets)."""
    from .temporal import range_join_buckets

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "value")
    iv = spark.createDataFrame(RANGE_INTERVALS, "label long, lo double, hi double")
    out = range_join_buckets(ev, iv, "value", width=RANGE_BUCKET_WIDTH)
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("label").cast("long").alias("label"),
    )


def _sql_range_bucket_join() -> str:
    rows = ", ".join(f"({k}, {lo}, {hi})" for k, lo, hi in RANGE_INTERVALS)
    return f"""
WITH iv AS (SELECT * FROM (VALUES {rows}) t(label, lo, hi))
SELECT CAST(e.event_id AS BIGINT) AS event_id, CAST(i.label AS BIGINT) AS label
FROM events e JOIN iv i ON e.value >= i.lo AND e.value < i.hi
"""


EVAL_QUERIES = {
    "sessionization": q_sessionization,
    "eval_metrics": q_eval_metrics,
    "batch_eval_summary": q_batch_eval_summary,
    "events_tumbling": q_events_tumbling,
    "rollup_pricing": q_rollup_pricing,
    "revenue_by_nation": q_revenue_by_nation,
    "salted_postings": q_salted_postings,
    "asof_status": q_asof_status,
    "range_bucket_join": q_range_bucket_join,
    "shipping_priority": q_shipping_priority,
    "eval_prk": q_eval_prk,
}

EVAL_ORACLES = {
    "sessionization": SQL_SESSIONIZATION,
    "eval_metrics": _sql_eval_metrics(),
    "batch_eval_summary": _sql_batch_eval_summary(),
    "events_tumbling": SQL_EVENTS_TUMBLING,
    "rollup_pricing": SQL_ROLLUP_PRICING,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "salted_postings": SQL_SALTED_POSTINGS,
    "asof_status": SQL_ASOF_STATUS,
    "range_bucket_join": _sql_range_bucket_join(),
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "eval_prk": _sql_eval_prk(),
}
