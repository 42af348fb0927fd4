"""Gradeable queries: batch multi-query BM25, per-field term stats,
query expansion, WAND top-k (same oracle as exact BM25 — WAND is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import entry_queries as EQ
from .index.builder import field_term_stats
from .query import scoring
from .query.batch import batch_bm25_search, expand_query_terms

#: fixed query set, stem/stop off so the oracle is literal (qid, term) rows
BATCH_QUERIES = [
    (1, ("spark", "join", "merge")),
    (2, ("vector", "stream", "window")),
    (3, ("batch", "group")),
    (4, ("zzznotfound",)),
    (5, ("filter", "sort", "key", "hash")),
]
BATCH_K = 10

#: fixed expansion dictionary (the WordNet/GloVe slot); weights include a
#: negative "antonym" row like the reference's -1.5 (Search_FR.java:447)
EXPANSIONS = [
    ("spark", "flame", 1.0),
    ("spark", "slow", -1.5),
    ("join", "merge", 0.5),
    ("merge", "join", 0.5),
]


def _batch_terms_df(spark: SparkSession) -> DataFrame:
    rows = [(qid, t, 1.0) for qid, terms in BATCH_QUERIES for t in terms]
    return spark.createDataFrame(rows, "qid long, term string, qtf double")


def q_batch_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ix = EQ.get_index(spark, sf_dir)
    out = batch_bm25_search(ix, _batch_terms_df(spark), k=BATCH_K, cfg=EQ.NOSTEM_CFG)
    return out.select(
        "qid",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank").cast("long").alias("rank"),
        F.round("score", 4).alias("score"),
    )


def _sql_batch_queries() -> str:
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, terms in BATCH_QUERIES for t in terms
    )
    return f"(VALUES {rows}) q(qid, term)"


SQL_BATCH_BM25 = f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
q AS (SELECT qid, term FROM {_sql_batch_queries()}),
scored AS (
  SELECT q.qid, p.doc_id,
         (ln((s.n - f.df + 0.5) / (f.df + 0.5)) / ln(2))
           * p.tf * ({EQ.K1} + 1)
           / (p.tf + {EQ.K1} * (1 - {EQ.B} + {EQ.B} * d.dl / s.avgdl)) AS ts
  FROM post p JOIN q USING (term) JOIN dft f USING (term)
  JOIN dl d USING (doc_id) CROSS JOIN stats s
),
agg AS (SELECT qid, doc_id, sum(ts) AS score FROM scored GROUP BY 1, 2),
ranked AS (
  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rank, score
  FROM agg
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rank AS BIGINT) AS rank, round(score, 4) AS score
FROM ranked WHERE rank <= {BATCH_K}
"""


def sql_batch_results_cte(q_block: str | None = None) -> str:
    """CTE chain ending in ``results(qid, doc_id, score, rank)`` with
    UNROUNDED BM25 scores and ranks computed on them (rank <= BATCH_K).
    Shared by every oracle that CONSUMES batch results (fusion, P@k/MRR):
    re-ranking on SQL_BATCH_BM25's 4-decimal-rounded scores can swap
    near-tied docs relative to the engine's unrounded ordering.

    ``q_block`` overrides the query-set CTE(s): any helper CTEs plus a
    final ``q(qid, term)`` (may reference ``post``/``toks``) — used by
    the corrected-query lifecycle to source q from the spelling
    corrector instead of literal VALUES."""
    qb = q_block or f"q AS (SELECT qid, term FROM {_sql_batch_queries()})"
    return f"""{EQ.TOKS_CTE.strip().rstrip()},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS nd,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
{qb},
scored AS (
  SELECT q.qid, p.doc_id,
         (ln((s.nd - f.df + 0.5) / (f.df + 0.5)) / ln(2))
           * p.tf * ({EQ.K1} + 1)
           / (p.tf + {EQ.K1} * (1 - {EQ.B} + {EQ.B} * d.dl / s.avgdl)) AS ts
  FROM post p JOIN q USING (term) JOIN dft f USING (term)
  JOIN dl d USING (doc_id) CROSS JOIN stats s
),
agg AS (SELECT qid, doc_id, sum(ts) AS score FROM scored GROUP BY 1, 2),
rk AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
),
results AS (SELECT qid, doc_id, score, rank FROM rk WHERE rank <= {BATCH_K})"""


def q_field_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = EQ.load_documents(spark, sf_dir)
    out = field_term_stats(docs, "text", "lang", EQ.NOSTEM_CFG)
    return out.select(F.col("field").alias("lang"), "term", "tf", "df")


SQL_FIELD_TERM_STATS = """
WITH raw AS (
  SELECT lang, doc_id,
         unnest(string_split_regex(trim(lower(regexp_replace(regexp_replace(text,
              '[^\\p{L}\\p{Nd}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +')) AS term
  FROM documents
),
toks AS (SELECT lang, doc_id, term FROM raw WHERE term <> '')
SELECT lang, term, CAST(count(*) AS BIGINT) AS tf,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM toks GROUP BY lang, term
"""


def q_expanded_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ix = EQ.get_index(spark, sf_dir)
    base = EQ.query_terms_df(spark)
    exp = spark.createDataFrame(EXPANSIONS, "term string, expansion string, weight double")
    qt = expand_query_terms(base, exp, expansion_weight=1.0)
    # VSM uses qtf, making expansion weights observable in scores
    res = scoring.vsm_search(ix, qt, k=EQ.TOPK, cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


def _sql_expansions() -> str:
    rows = ", ".join(f"('{t}', '{e}', {w})" for t, e, w in EXPANSIONS)
    return f"(VALUES {rows}) ex(term, expansion, weight)"



def sql_vsm_scored_tail(qterms: str = "qterms") -> str:
    """CTE tail + final SELECT shared by every VSM-over-expanded-query
    oracle (expanded/glove/antonym/external/rocchio): consumes ``post``,
    ``dft``, ``stats(n)`` and a ``{qterms}(term, qtf)`` CTE defined
    upstream.  One copy so a change to the VSM convention (floor-idf
    norms, zero-norm guard, tie-break) cannot silently diverge between
    oracles."""
    return f"""norms AS (
  SELECT p.doc_id,
         sum(pow(p.tf * ln(floor((s.n + 1) / f.df)) / ln(2), 2)) AS norm2
  FROM post p JOIN dft f USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
),
qw AS (SELECT q.term, q.qtf * ln(s.n / f.df) / ln(2) AS w_q
       FROM {qterms} q JOIN dft f USING (term) CROSS JOIN stats s),
qnorm AS (SELECT sum(w_q * w_q) AS q_norm2 FROM qw),
vdots AS (
  SELECT p.doc_id, sum(p.tf * (ln(s.n / f.df) / ln(2)) * w.w_q) AS dot
  FROM post p JOIN qw w USING (term) JOIN dft f USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       round(CASE WHEN n.norm2 > 0 AND qn.q_norm2 > 0
                  THEN d.dot / sqrt(n.norm2 * qn.q_norm2) ELSE 0 END, 4) AS score
FROM vdots d JOIN norms n USING (doc_id) CROSS JOIN qnorm qn
ORDER BY (CASE WHEN n.norm2 > 0 AND qn.q_norm2 > 0
               THEN d.dot / sqrt(n.norm2 * qn.q_norm2) ELSE 0 END) DESC, d.doc_id ASC
LIMIT {EQ.TOPK}"""


SQL_EXPANDED_BM25 = f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n),
base AS (SELECT unnest({EQ._sql_terms_list()}) AS term, 1.0 AS qtf),
ex AS (SELECT term, expansion, weight FROM {_sql_expansions()}),
extra AS (SELECT e.expansion AS term, b.qtf * e.weight * 1.0 AS qtf
          FROM base b JOIN ex e USING (term)),
qterms AS (
  SELECT term, sum(qtf) AS qtf FROM (
    SELECT term, qtf FROM base UNION ALL SELECT term, qtf FROM extra)
  GROUP BY term
),
{sql_vsm_scored_tail()}
"""


# --- derived GloVe-style expansion dictionary (R7) --------------------------

#: DuckDB mirror of expansion.derive_term_neighbors: distributional
#: cosine over tf-profiles, top-1 per term, tie-break (sim DESC, term ASC)
NEIGHBORS_CTE = f"""
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
nrm AS (SELECT term, sqrt(sum(CAST(tf AS DOUBLE) * tf)) AS nrm FROM post GROUP BY term),
dots AS (
  SELECT a.term AS term_a, b.term AS term_b,
         sum(CAST(a.tf AS DOUBLE) * b.tf) AS dot
  FROM post a JOIN post b USING (doc_id)
  WHERE a.term <> b.term GROUP BY 1, 2
),
sims AS (
  SELECT term_a, term_b, dot / (na.nrm * nb.nrm) AS sim
  FROM dots JOIN nrm na ON na.term = term_a JOIN nrm nb ON nb.term = term_b
),
nbr AS (
  SELECT term_a AS term, term_b AS expansion, sim,
         row_number() OVER (PARTITION BY term_a ORDER BY sim DESC, term_b ASC) AS rn
  FROM sims
)
"""


def q_term_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived dictionary itself, graded: top-1 distributional
    neighbor per vocabulary term."""
    from .query.expansion import derive_term_neighbors

    ix = EQ.get_index(spark, sf_dir)
    out = derive_term_neighbors(ix.postings, k=1)
    return out.select("term", "expansion", F.round("sim", 4).alias("sim"))


SQL_TERM_NEIGHBORS = f"""
WITH {EQ.TOKS_CTE},
{NEIGHBORS_CTE}
SELECT term, expansion, round(sim, 4) AS sim FROM nbr WHERE rn <= 1
"""


def q_glove_vsm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 end-to-end with the DERIVED dictionary: each query term's
    nearest distributional neighbor joins the query at weight 1.0
    (GloveSynonyms1 semantics, DWeight=false), then VSM top-k."""
    from .query.expansion import derive_term_neighbors

    ix = EQ.get_index(spark, sf_dir)
    exp = derive_term_neighbors(ix.postings, k=1).select("term", "expansion", "weight")
    qt = expand_query_terms(EQ.query_terms_df(spark), exp, expansion_weight=1.0)
    res = scoring.vsm_search(ix, qt, k=EQ.TOPK, cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


SQL_GLOVE_VSM = f"""
WITH {EQ.TOKS_CTE},
{NEIGHBORS_CTE},
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n),
base AS (SELECT unnest({EQ._sql_terms_list()}) AS term, 1.0 AS qtf),
extra AS (SELECT nb.expansion AS term, b.qtf * 1.0 * 1.0 AS qtf
          FROM base b JOIN nbr nb ON nb.term = b.term AND nb.rn <= 1),
qterms AS (
  SELECT term, sum(qtf) AS qtf FROM (
    SELECT term, qtf FROM base UNION ALL SELECT term, qtf FROM extra)
  GROUP BY term
),
{sql_vsm_scored_tail()}
"""


# --- spelling correction (SymSpell-style) -----------------------------------

#: "atble" is an adjacent transposition of "table" — Levenshtein 2 but
#: Damerau/OSA 1, exercising the transposition branch of the verifier
MISSPELLED = ("spork", "jion", "mergee", "windoww", "batch", "zzzzqq", "atble")


def q_spell_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damerau-distance-1 query-term correction against the index
    vocabulary: deletion-variant equi-join blocking + levenshtein-or-
    transposition verify, top-1 by (distance, df, term).  Exact hits
    self-suggest; no-candidate terms keep NULLs."""
    from .query.spelling import correct_terms

    ix = EQ.get_index(spark, sf_dir)
    q = spark.createDataFrame([(t,) for t in MISSPELLED], "qterm string")
    out = correct_terms(ix.terms.select("term", "df"), q, max_distance=1)
    return out.select(
        "qterm", "suggestion",
        F.col("df").cast("long").alias("df"),
        F.col("distance").cast("long").alias("distance"),
    )


#: DuckDB deletion-1 neighborhood / adjacent-swap variant expressions,
#: shared by the spell-correction oracles (mirrors of
#: spelling.deletion_variants_expr / transposition_variants_expr)
SQL_DELS = ("list_distinct(list_append("
            "list_transform(range(length({c})), i -> substr({c}, 1, i) || substr({c}, i + 2)), {c}))")
SQL_TRANS = ("list_transform(range(1, length({c})), "
             "i -> substr({c}, 1, i - 1) || substr({c}, i + 1, 1) "
             "|| substr({c}, i, 1) || substr({c}, i + 2))")


def sql_correction_ctes(q0_sql: str, with_qid: bool = False) -> str:
    """The ONE SymSpell-correction CTE chain every correction oracle
    shares (deletion-variant blocking over ``post``'s vocabulary,
    Damerau verify with the transposition least(lev,1) CASE, top-1 per
    query term): ``vocab``/``vidx``/``q0``/``qv``/``cand0``/``best``.
    ``q0_sql`` supplies the query rows (must yield ``qterm`` and, with
    ``with_qid``, ``qid``); consumers select from ``best`` (suggestion,
    df, distance, rn).  Single definition — a semantics tweak here
    reaches every correction oracle at once."""
    dels, trans = SQL_DELS, SQL_TRANS
    qcols = "qid, qterm" if with_qid else "qterm"
    return f"""vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
vidx AS (SELECT term, df, unnest({dels.format(c='term')}) AS variant FROM vocab),
q0 AS ({q0_sql}),
qv AS (SELECT {qcols}, unnest({dels.format(c='qterm')}) AS variant FROM q0),
cand0 AS (
  SELECT DISTINCT {qcols}, term, df,
         CASE WHEN qterm <> term AND list_contains({trans.format(c='qterm')}, term)
              THEN least(levenshtein(qterm, term), 1)
              ELSE levenshtein(qterm, term) END AS distance
  FROM qv JOIN vidx USING (variant)
),
best AS (
  SELECT {qcols}, term AS suggestion, df, distance,
         row_number() OVER (PARTITION BY {qcols}
                            ORDER BY distance ASC, df DESC, term ASC) AS rn
  FROM cand0 WHERE distance <= 1
)"""


def _sql_spell_correct() -> str:
    qs = ", ".join(f"'{t}'" for t in MISSPELLED)
    return f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
{sql_correction_ctes(f"SELECT unnest([{qs}]) AS qterm")}
SELECT q0.qterm, b.suggestion, CAST(b.df AS BIGINT) AS df,
       CAST(b.distance AS BIGINT) AS distance
FROM q0 LEFT JOIN best b ON b.qterm = q0.qterm AND b.rn = 1
"""


# --- derived antonym dictionary (R6) ----------------------------------------

#: extends NEIGHBORS_CTE: the antonym-analog is the LEAST-cosine
#: co-occurring term per term (contrast with observable support),
#: tie-break (sim ASC, term ASC) — mirror of expansion.derive_term_antonyms
ANTONYM_CTE = f"""
{NEIGHBORS_CTE.strip().rstrip()},
anb AS (
  SELECT term_a AS term, term_b AS expansion, sim,
         row_number() OVER (PARTITION BY term_a ORDER BY sim ASC, term_b ASC) AS rn
  FROM sims
)
"""

ANTONYM_WEIGHT = -1.5


def q_term_antonyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived antonym dictionary itself, graded."""
    from .query.expansion import derive_term_antonyms

    ix = EQ.get_index(spark, sf_dir)
    out = derive_term_antonyms(ix.postings, k=1, weight=ANTONYM_WEIGHT)
    return out.select("term", "expansion", "weight", F.round("sim", 4).alias("sim"))


SQL_TERM_ANTONYMS = f"""
WITH {EQ.TOKS_CTE},
{ANTONYM_CTE}
SELECT term, expansion, CAST({ANTONYM_WEIGHT} AS DOUBLE) AS weight,
       round(sim, 4) AS sim
FROM anb WHERE rn <= 1
"""


def q_antonym_vsm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 end-to-end with the DERIVED antonym dictionary: each query
    term's most-contrastive co-occurring term joins the query at the
    reference's antonym weight -1.5 (Search_FR.java:447-623), observable
    through VSM scores as negative qtf rows."""
    from .query.expansion import derive_term_antonyms

    ix = EQ.get_index(spark, sf_dir)
    ant = derive_term_antonyms(ix.postings, k=1, weight=ANTONYM_WEIGHT).select(
        "term", "expansion", "weight")
    qt = expand_query_terms(EQ.query_terms_df(spark), ant, expansion_weight=1.0)
    res = scoring.vsm_search(ix, qt, k=EQ.TOPK, cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


SQL_ANTONYM_VSM = f"""
WITH {EQ.TOKS_CTE},
{ANTONYM_CTE},
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n),
base AS (SELECT unnest({EQ._sql_terms_list()}) AS term, 1.0 AS qtf),
extra AS (SELECT ab.expansion AS term, b.qtf * {ANTONYM_WEIGHT} * 1.0 AS qtf
          FROM base b JOIN anb ab ON ab.term = b.term AND ab.rn <= 1),
qterms AS (
  SELECT term, sum(qtf) AS qtf FROM (
    SELECT term, qtf FROM base UNION ALL SELECT term, qtf FROM extra)
  GROUP BY term
),
{sql_vsm_scored_tail()}
"""


_BLOCK_CACHE: dict[str, tuple] = {}


def get_blocks(spark: SparkSession, sf_dir: str) -> tuple:
    """(blocks, dl_blocks) at block_span=256, cached per sf_dir."""
    from .index.compression import build_block_postings, build_dl_blocks

    ix = EQ.get_index(spark, sf_dir)
    if sf_dir not in _BLOCK_CACHE:
        blocks = build_block_postings(ix.postings, block_span=256).cache()
        dlb = build_dl_blocks(ix.docs, block_span=256).cache()
        blocks.count(); dlb.count()
        _BLOCK_CACHE[sf_dir] = (blocks, dlb)
    return _BLOCK_CACHE[sf_dir]


def q_wand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k via the block-max WAND kernel; oracle = the exhaustive
    BM25 SQL (WAND prunes but never changes the result)."""
    from .query.wand import bm25_topk_wand

    ix = EQ.get_index(spark, sf_dir)
    blocks, dlb = get_blocks(spark, sf_dir)
    out = bm25_topk_wand(blocks, dlb, ix.terms, ix.stats,
                         list(EQ.QUERY_TERMS), k=EQ.TOPK, cfg=EQ.NOSTEM_CFG,
                         block_span=256, docs=ix.docs)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


def q_batch_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE batch query set through block-max WAND in one plan
    (one cogroup for all queries, dl fanned out per qid by
    construction) — exact, so the oracle is the exhaustive batch BM25
    SQL.  Integer doc keys mean doc_int == doc_id."""
    from .query.wand import batch_bm25_topk_wand

    ix = EQ.get_index(spark, sf_dir)
    blocks, dlb = get_blocks(spark, sf_dir)
    queries = {qid: list(ts) for qid, ts in BATCH_QUERIES}
    out = batch_bm25_topk_wand(blocks, dlb, ix.terms, ix.stats, queries,
                               k=BATCH_K, cfg=EQ.NOSTEM_CFG, block_span=256)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("doc_int").cast("long").alias("doc_id"),
        F.col("rank").cast("long").alias("rank"),
        F.round("score", 4).alias("score"),
    )


# --- phrase (positional) search --------------------------------------------

PHRASE = ("table", "hash")  # frequent adjacent bigram in the testdata
PHRASE_K = 50

_POS_INDEX_CACHE: dict[str, object] = {}


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .index.builder import build_index
    from .query.phrase import phrase_search

    if sf_dir not in _POS_INDEX_CACHE:
        docs = EQ.load_documents(spark, sf_dir)
        _POS_INDEX_CACHE[sf_dir] = build_index(
            docs, EQ.NOSTEM_CFG, doc_col="doc_id", text_col="text",
            with_positions=True,
        )
    ix = _POS_INDEX_CACHE[sf_dir]
    out = phrase_search(ix, list(PHRASE), k=PHRASE_K)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("score").cast("long").alias("n_occurrences"))


SQL_PHRASE_SEARCH = f"""
WITH tokarr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(regexp_replace(regexp_replace(text,
             '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +'),
             t -> t <> '') AS toks
  FROM documents
),
tokpos AS (
  SELECT doc_id, pos, tok
  FROM (SELECT doc_id,
               unnest(list_transform(range(len(toks)),
                      i -> {{'pos': i, 'tok': toks[i + 1]}}), recursive := true)
        FROM tokarr)
),
plists AS (
  SELECT doc_id, tok AS term, list(pos ORDER BY pos) AS ps
  FROM tokpos GROUP BY doc_id, tok
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST(len(list_intersect(list_transform(a.ps, x -> x + 1), b.ps)) AS BIGINT) AS n_occurrences
FROM plists a JOIN plists b USING (doc_id)
WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
  AND len(list_intersect(list_transform(a.ps, x -> x + 1), b.ps)) > 0
ORDER BY n_occurrences DESC, a.doc_id ASC
LIMIT {PHRASE_K}
"""


# --- proximity (min-token-distance) search ----------------------------------

PROX_PAIR = ("join", "merge")
PROX_K = 50


def q_proximity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity ranking over the positional index: docs with both terms
    ranked by the MIN token distance between any occurrence pair, found
    by a sorted-merge over the two position lists (O(tf_a+tf_b) per doc
    — never the positions cross-product).  The oracle deliberately IS
    the brute-force cross-product min: two different algorithms, one
    answer."""
    from .index.builder import build_index
    from .query.phrase import proximity_search

    if sf_dir not in _POS_INDEX_CACHE:
        docs = EQ.load_documents(spark, sf_dir)
        _POS_INDEX_CACHE[sf_dir] = build_index(
            docs, EQ.NOSTEM_CFG, doc_col="doc_id", text_col="text",
            with_positions=True,
        )
    ix = _POS_INDEX_CACHE[sf_dir]
    out = proximity_search(ix, PROX_PAIR[0], PROX_PAIR[1], k=PROX_K)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "min_dist", "n_a", "n_b")


SQL_PROXIMITY_TOPK = f"""
WITH tokarr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(regexp_replace(regexp_replace(text,
             '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +'),
             t -> t <> '') AS toks
  FROM documents
),
tokpos AS (
  SELECT doc_id, pos, tok
  FROM (SELECT doc_id,
               unnest(list_transform(range(len(toks)),
                      i -> {{'pos': i, 'tok': toks[i + 1]}}), recursive := true)
        FROM tokarr)
),
plists AS (
  SELECT doc_id, tok AS term, list(pos ORDER BY pos) AS ps
  FROM tokpos GROUP BY doc_id, tok
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST(list_min(flatten(list_transform(a.ps,
            x -> list_transform(b.ps, y -> abs(x - y))))) AS BIGINT) AS min_dist,
       CAST(len(a.ps) AS BIGINT) AS n_a,
       CAST(len(b.ps) AS BIGINT) AS n_b
FROM plists a JOIN plists b USING (doc_id)
WHERE a.term = '{PROX_PAIR[0]}' AND b.term = '{PROX_PAIR[1]}'
ORDER BY min_dist ASC, doc_id ASC
LIMIT {PROX_K}
"""


# --- best-snippet extraction (min window covering all query terms) -----------

SNIPPET_TERMS = ("table", "join", "hash")
SNIPPET_K = 50


def q_snippet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet/highlight primitive over the positional index: for every
    doc containing ALL query terms, the minimal token window covering
    at least one occurrence of each — corpus-wide tightest snippets
    first.  The engine enumerates candidate starts from the merged
    position lists with pure column expressions (query/phrase.py
    snippet_search); the oracle recomputes the same window from raw
    text with DuckDB list lambdas — two implementations, one answer."""
    from .query.phrase import snippet_search

    from .index.builder import build_index

    if sf_dir not in _POS_INDEX_CACHE:
        docs = EQ.load_documents(spark, sf_dir)
        _POS_INDEX_CACHE[sf_dir] = build_index(
            docs, EQ.NOSTEM_CFG, doc_col="doc_id", text_col="text",
            with_positions=True,
        )
    ix = _POS_INDEX_CACHE[sf_dir]
    return snippet_search(ix, list(SNIPPET_TERMS), k=SNIPPET_K)


SQL_SNIPPET_TOPK = f"""
WITH tokarr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(regexp_replace(regexp_replace(text,
             '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g'), '[0-9]', ' ', 'g'))), ' +'),
             t -> t <> '') AS toks
  FROM documents
),
tokpos AS (
  SELECT doc_id, pos, tok
  FROM (SELECT doc_id,
               unnest(list_transform(range(len(toks)),
                      i -> {{'pos': i, 'tok': toks[i + 1]}}), recursive := true)
        FROM tokarr)
),
plists AS (
  SELECT doc_id, tok AS term, list(pos ORDER BY pos) AS ps
  FROM tokpos GROUP BY doc_id, tok
),
trio AS (
  SELECT a.doc_id, a.ps AS pa, b.ps AS pb, c.ps AS pc
  FROM plists a JOIN plists b USING (doc_id) JOIN plists c USING (doc_id)
  WHERE a.term = '{SNIPPET_TERMS[0]}' AND b.term = '{SNIPPET_TERMS[1]}'
    AND c.term = '{SNIPPET_TERMS[2]}'
),
cands AS (
  SELECT doc_id, s,
         list_min(list_filter(pa, p -> p >= s)) AS ea,
         list_min(list_filter(pb, p -> p >= s)) AS eb,
         list_min(list_filter(pc, p -> p >= s)) AS ec
  FROM (SELECT doc_id, pa, pb, pc,
               unnest(list_sort(pa || pb || pc)) AS s FROM trio)
),
valid AS (
  SELECT doc_id, s AS win_start, greatest(ea, eb, ec) AS win_end,
         greatest(ea, eb, ec) - s AS width
  FROM cands
  WHERE ea IS NOT NULL AND eb IS NOT NULL AND ec IS NOT NULL
),
best AS (
  SELECT doc_id, win_start, win_end, width,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY width ASC, win_start ASC) AS rn
  FROM valid
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(win_start AS BIGINT) AS win_start,
       CAST(win_end AS BIGINT) AS win_end,
       CAST(width AS BIGINT) AS width
FROM best WHERE rn = 1
ORDER BY width ASC, doc_id ASC
LIMIT {SNIPPET_K}
"""


# --- retrieve-then-rerank lifecycle -------------------------------------------

RERANK_N = 100   # lexical candidate pool
RERANK_K = 15    # final semantic top-k


def q_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieve -> rerank: BM25 produces a cheap lexical
    candidate pool (top-{RERANK_N}), then an embedding-cosine pass
    reranks JUST that pool — the standard modern serving shape (cheap
    recall stage over the inverted index, expensive precision stage
    over k vectors).  At scale the rerank join touches RERANK_N rows
    per query regardless of corpus size: the candidate pool is
    broadcast against the (bucketable) embeddings table, never the
    reverse.  Query vector = embedding of vec_id 0, the registry's
    standard probe (entry_textops._query_vec)."""
    import math as _math

    from . import entry_textops as ET
    from .textops.similarity import dot_expr, norm_expr

    ix = EQ.get_index(spark, sf_dir)
    cand = scoring.bm25_search(ix, EQ.query_terms_df(spark), k=RERANK_N,
                               cfg=EQ.NOSTEM_CFG)
    emb = ET._emb(spark, sf_dir)
    qv = ET._query_vec(spark, sf_dir)
    q = F.array(*[F.lit(float(v)) for v in qv])
    e = F.col("embedding").cast("array<double>")
    qn = F.lit(float(_math.sqrt(sum(v * v for v in qv))))
    out = (
        F.broadcast(cand).join(emb, cand["doc_id"] == emb["vec_id"], "inner")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("bm25_score"),
            (dot_expr(e, q) / (norm_expr(e) * qn)).alias("_c"),
        )
        .orderBy(F.desc("_c"), F.asc("doc_id"))
        .limit(RERANK_K)
        .select("doc_id", "bm25_score", F.round("_c", 4).alias("cosine"))
    )
    return out


def _sql_rerank_topk() -> str:
    terms_sql = EQ._sql_terms_list()
    return f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
q AS (SELECT unnest({terms_sql}) AS term),
scored AS (
  SELECT p.doc_id,
         (ln((s.n - f.df + 0.5) / (f.df + 0.5)) / ln(2))
           * p.tf * ({EQ.K1} + 1)
           / (p.tf + {EQ.K1} * (1 - {EQ.B} + {EQ.B} * d.dl / s.avgdl)) AS ts
  FROM post p
  JOIN q USING (term)
  JOIN dft f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
),
cand AS (
  SELECT doc_id, sum(ts) AS bm25
  FROM scored GROUP BY doc_id
  ORDER BY sum(ts) DESC, doc_id ASC
  LIMIT {RERANK_N}
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
       round(c.bm25, 4) AS bm25_score,
       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.v)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv.v, qv.v))), 4) AS cosine
FROM cand c
JOIN embeddings e ON e.vec_id = c.doc_id
CROSS JOIN qv
ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.v)
         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(qv.v, qv.v))) DESC,
         c.doc_id ASC
LIMIT {RERANK_K}
"""


# --- spelling correction IN the query lifecycle ------------------------------

#: a fully-typo'd query: substitution, adjacent transposition, insertion.
#: None of these exist in the vocabulary, so the RAW query scores 0 docs
#: (the reference's silent vocabulary-probe miss, Indexer.java:1204-1234);
#: the corrected query ("spark join merge") retrieves normally.
TYPO_QUERY = ("spork", "jion", "mergee")


def q_corrected_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo'd query -> SymSpell correction against the index vocabulary
    -> BM25 top-k, all in-plan (the suggestion set is a DataFrame fed
    straight into the scoring join — no driver round-trip between the
    corrector and the scorer)."""
    from .query.spelling import correct_terms

    ix = EQ.get_index(spark, sf_dir)
    q = spark.createDataFrame([(t,) for t in TYPO_QUERY], "qterm string")
    corrected = correct_terms(ix.terms.select("term", "df"), q, max_distance=1)
    qt = (
        corrected.filter(F.col("suggestion").isNotNull())
        .select(F.col("suggestion").alias("term"))
        .distinct()
    )
    res = scoring.bm25_search(ix, qt, k=EQ.TOPK, cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


def _sql_corrected_bm25() -> str:
    qs = ", ".join(f"'{t}'" for t in TYPO_QUERY)
    return f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
{sql_correction_ctes(f"SELECT unnest([{qs}]) AS qterm")},
q AS (SELECT DISTINCT suggestion AS term FROM best WHERE rn = 1),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
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


# --- corrected-batch lifecycle pieces (shared with entry_graph) --------------

#: typo'd twin of BATCH_QUERIES — the degraded-query lifecycle input:
#: substitutions (spork->spark), transpositions (jion->join,
#: filtre->filter), insertions (windoww->window), exact hits
#: (self-suggest at distance 0), and one uncorrectable term (zzzzqq —
#: its qid drops out entirely, like the reference returning nothing
#: for an unknown query)
TYPO_BATCH = [
    (1, ("spork", "jion", "merge")),
    (2, ("vector", "stream", "windoww")),
    (3, ("batch", "group")),
    (4, ("zzzzqq",)),
    (5, ("filtre", "sort", "key", "hash")),
]


def sql_corrected_q_block() -> str:
    """Helper CTEs + ``q(qid, term)`` sourcing the batch query set from
    the spelling corrector (references ``post`` from the results chain):
    the shared correction chain threaded with qid -> per-qid DISTINCT
    corrected term set.  Plug into
    ``sql_batch_results_cte(q_block=...)``."""
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, terms in TYPO_BATCH for t in terms
    )
    q0 = f"SELECT qid, qterm FROM (VALUES {rows}) t(qid, qterm)"
    return f"""{sql_correction_ctes(q0, with_qid=True)},
q AS (SELECT DISTINCT qid, suggestion AS term FROM best WHERE rn = 1)"""


# --- EXTERNAL expansion dictionary (shipped fixture, R6/R7) ------------------

import os as _os

EXPANSION_FIXTURE = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "fixtures", "expansion_dict.jsonl")

#: query whose terms hit the external dictionary's synonym (join->merge)
#: and antonym (fast->slow, big->small) entries
EXTERNAL_EXP_QUERY = ("join", "fast", "big")


def q_external_expansion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6/R7 with a SHIPPED external dictionary: the committed
    fixtures/expansion_dict.jsonl (WordNet-slot table, reference weights
    1.0/2.0 synonym and -1.5 antonym, Search_FR.java:281-623,641-750)
    drives expand_query_terms, then VSM top-k (qtf makes the weights
    observable).  Expansions absent from the corpus ("flame") are
    harmless by construction."""
    exp = spark.read.json(
        EXPANSION_FIXTURE,
        schema="term string, expansion string, weight double, kind string",
    ).select("term", "expansion", "weight")
    ix = EQ.get_index(spark, sf_dir)
    base = spark.createDataFrame([(t, 1.0) for t in EXTERNAL_EXP_QUERY],
                                 "term string, qtf double")
    qt = expand_query_terms(base, exp, expansion_weight=1.0)
    res = scoring.vsm_search(ix, qt, k=EQ.TOPK, cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


def _sql_external_expansion() -> str:
    terms = "[" + ", ".join(f"'{t}'" for t in EXTERNAL_EXP_QUERY) + "]"
    return f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n),
base AS (SELECT unnest({terms}) AS term, 1.0 AS qtf),
ex AS (
  SELECT term, expansion, weight
  FROM read_json('{EXPANSION_FIXTURE}', format='newline_delimited',
                 columns={{'term': 'VARCHAR', 'expansion': 'VARCHAR',
                           'weight': 'DOUBLE', 'kind': 'VARCHAR'}})
),
extra AS (SELECT e.expansion AS term, b.qtf * e.weight * 1.0 AS qtf
          FROM base b JOIN ex e USING (term)),
qterms AS (
  SELECT term, sum(qtf) AS qtf FROM (
    SELECT term, qtf FROM base UNION ALL SELECT term, qtf FROM extra)
  GROUP BY term
),
{sql_vsm_scored_tail()}
"""


# --- Rocchio pseudo-relevance feedback --------------------------------------

ROCCHIO_FB_K = 10     # feedback depth (docs)
ROCCHIO_FB_TERMS = 3  # expansion terms kept
ROCCHIO_ALPHA, ROCCHIO_BETA = 1.0, 0.75


def q_rocchio_vsm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio PRF end-to-end: BM25 top-10 feedback docs -> tf-idf
    centroid -> top-3 new terms at β=0.75 -> VSM re-retrieval.  One
    plan, no driver round-trips between the two retrievals."""
    from .query.expansion import rocchio_expand

    ix = EQ.get_index(spark, sf_dir)
    qt = rocchio_expand(ix, EQ.query_terms_df(spark),
                        fb_k=ROCCHIO_FB_K, fb_terms=ROCCHIO_FB_TERMS,
                        alpha=ROCCHIO_ALPHA, beta=ROCCHIO_BETA,
                        cfg=EQ.NOSTEM_CFG)
    res = scoring.vsm_search(ix, qt, k=EQ.TOPK, cfg=EQ.NOSTEM_CFG)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 4).alias("score"))


SQL_ROCCHIO_VSM = f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
dl AS (SELECT d.doc_id, CAST(coalesce(t.dl, 0) AS DOUBLE) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
                 CAST((SELECT count(*) FROM toks) // (SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
q0 AS (SELECT unnest({EQ._sql_terms_list()}) AS term, 1.0 AS qtf),
bscored AS (
  SELECT p.doc_id,
         (ln((s.n - f.df + 0.5) / (f.df + 0.5)) / ln(2))
           * p.tf * ({EQ.K1} + 1)
           / (p.tf + {EQ.K1} * (1 - {EQ.B} + {EQ.B} * d.dl / s.avgdl)) AS ts
  FROM post p JOIN q0 USING (term) JOIN dft f USING (term)
  JOIN dl d USING (doc_id) CROSS JOIN stats s
),
fb AS (
  -- round(·, 9) at the cut: see rocchio_expand (engine-independent boundary)
  SELECT doc_id FROM (SELECT doc_id, sum(ts) AS score FROM bscored GROUP BY doc_id)
  ORDER BY round(score, 9) DESC, doc_id ASC LIMIT {ROCCHIO_FB_K}
),
cen AS (
  SELECT p.term,
         sum(p.tf * ln(s.n / f.df) / ln(2)) / (SELECT count(*) FROM fb) AS cw
  FROM post p JOIN fb USING (doc_id) JOIN dft f USING (term) CROSS JOIN stats s
  WHERE p.term NOT IN (SELECT term FROM q0)
  GROUP BY p.term
),
expd AS (SELECT term, {ROCCHIO_BETA} * cw AS qtf
         FROM cen ORDER BY round(cw, 9) DESC, term ASC LIMIT {ROCCHIO_FB_TERMS}),
qterms AS (
  SELECT term, sum(qtf) AS qtf FROM (
    SELECT term, {ROCCHIO_ALPHA} * qtf AS qtf FROM q0
    UNION ALL SELECT term, qtf FROM expd)
  GROUP BY term
),
{sql_vsm_scored_tail()}
"""



CONJ_K = 50


def q_batch_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-AND over the WHOLE batch query set IN-PLAN: per-qid
    required-term counts ride the plan (no per-query driver job deciding
    vocabulary-miss emptiness — the round-3 verdict's last minor);
    queries with any absent term drop out by arithmetic (qid 4's
    'zzznotfound' yields no rows)."""
    out = scoring.batch_conjunctive_search(
        EQ.get_index(spark, sf_dir), _batch_terms_df(spark),
        k=CONJ_K, cfg=EQ.NOSTEM_CFG)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank").cast("long").alias("rank"),
        "score",
    )


SQL_BATCH_CONJUNCTIVE = f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
q AS (SELECT DISTINCT qid, term FROM {_sql_batch_queries()}),
need AS (SELECT qid, count(*) AS n FROM q GROUP BY qid),
m AS (
  SELECT q.qid, p.doc_id, count(DISTINCT q.term) AS nt
  FROM post p JOIN q USING (term) GROUP BY 1, 2
),
keepd AS (
  SELECT m.qid, m.doc_id FROM m JOIN need USING (qid) WHERE m.nt = need.n
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY doc_id ASC) AS rank
  FROM keepd
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rank AS BIGINT) AS rank, 1.0 AS score
FROM ranked WHERE rank <= {CONJ_K}
"""



# --- vocabulary prefix auto-complete ----------------------------------------

SUGGEST_PREFIXES = ("s", "st", "me", "zz")  # incl. a no-match prefix
SUGGEST_K = 3


def q_prefix_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-complete: top-3 vocabulary terms by df per prefix — each
    prefix is a pushed-down StartsWith scan over the sorted vocabulary
    (see query/suggest.py), never a non-equi join."""
    from .query.suggest import suggest_prefixes

    ix = EQ.get_index(spark, sf_dir)
    return suggest_prefixes(ix.terms.select("term", "df"),
                            list(SUGGEST_PREFIXES), k=SUGGEST_K)


def _sql_prefix_suggest() -> str:
    parts = []
    for p in SUGGEST_PREFIXES:
        parts.append(f"""(
  SELECT '{p}' AS prefix, term, CAST(df AS BIGINT) AS df,
         CAST(row_number() OVER (ORDER BY df DESC, term ASC) AS BIGINT) AS rank
  FROM vocab WHERE term LIKE '{p}%'
  ORDER BY df DESC, term ASC LIMIT {SUGGEST_K})""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH {EQ.TOKS_CTE},
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT term, count(*) AS df FROM post GROUP BY term)
{body}
"""

BATCH_QUERIES_REG = {
    "corrected_bm25": q_corrected_bm25,
    "external_expansion_topk": q_external_expansion_topk,
    "rocchio_vsm_topk": q_rocchio_vsm_topk,
    "batch_conjunctive": q_batch_conjunctive,
    "prefix_suggest": q_prefix_suggest,
    "phrase_search": q_phrase_search,
    "proximity_topk": q_proximity_topk,
    "snippet_topk": q_snippet_topk,
    "rerank_topk": q_rerank_topk,
    "batch_bm25": q_batch_bm25,
    "field_term_stats": q_field_term_stats,
    "expanded_vsm": q_expanded_bm25,
    "term_neighbors": q_term_neighbors,
    "glove_vsm_topk": q_glove_vsm_topk,
    "term_antonyms": q_term_antonyms,
    "antonym_vsm_topk": q_antonym_vsm_topk,
    "wand_topk": q_wand_topk,
    "batch_wand": q_batch_wand,
    "spell_correct": q_spell_correct,
}

BATCH_ORACLES = {
    "corrected_bm25": _sql_corrected_bm25(),
    "external_expansion_topk": _sql_external_expansion(),
    "rocchio_vsm_topk": SQL_ROCCHIO_VSM,
    "batch_conjunctive": SQL_BATCH_CONJUNCTIVE,
    "prefix_suggest": _sql_prefix_suggest(),
    "phrase_search": SQL_PHRASE_SEARCH,
    "proximity_topk": SQL_PROXIMITY_TOPK,
    "snippet_topk": SQL_SNIPPET_TOPK,
    "rerank_topk": _sql_rerank_topk(),
    "batch_bm25": SQL_BATCH_BM25,
    "field_term_stats": SQL_FIELD_TERM_STATS,
    "expanded_vsm": SQL_EXPANDED_BM25,
    "term_neighbors": SQL_TERM_NEIGHBORS,
    "glove_vsm_topk": SQL_GLOVE_VSM,
    "term_antonyms": SQL_TERM_ANTONYMS,
    "antonym_vsm_topk": SQL_ANTONYM_VSM,
    "wand_topk": EQ.SQL_BM25_TOPK,
    "batch_wand": SQL_BATCH_BM25,
    "spell_correct": _sql_spell_correct(),
}
