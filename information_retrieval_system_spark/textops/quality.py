"""Text analysis for training-data curation: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure column expressions (whole-stage codegen); each has an exact
DuckDB oracle in entry_queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..analysis.analyzer import tokens_array_expr
from ..analysis.stopwords import STOPWORDS

#: ASCII-only English function words used by the language-ID heuristic
EN_MARKERS = tuple(sorted(w for w in STOPWORDS if w.isascii()))[:120]

FP_MOD = (1 << 31) - 1
FP_MUL = 1000003


def en_stopword_ratio(text_col: Column) -> Column:
    toks = tokens_array_expr(text_col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*EN_MARKERS)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def language_id(df: DataFrame, text_col: str, id_col: str,
                threshold: float = 0.08) -> DataFrame:
    """-> (id, en_ratio, lang_pred): 'en' when the English function-word
    ratio clears the threshold, else 'unknown'.  (An n-gram model slots in
    the same shape; the heuristic keeps the oracle SQL-expressible.)"""
    r = en_stopword_ratio(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.round(r, 4).alias("en_ratio"),
        F.when(r >= threshold, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_pred"),
    )


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """-> (id, ws_tokens, word_tokens, punct_runs): whitespace split count,
    word-regex count (BPE-ish pre-tokenizer units) and punctuation runs."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+"), 0)).cast("long").alias("word_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]+"), 0)).cast("long").alias("punct_runs"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """-> (id, n_chars, n_tokens, mean_tok_len, stop_ratio, digit_ratio,
    score): a Gopher-rules-flavored quality score in [0,1]."""
    t = F.col(text_col)
    toks = tokens_array_expr(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    mean_len = F.when(n_tokens > 0,
                      F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
                      / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = en_stopword_ratio(t)
    digit_ratio = F.when(n_chars > 0,
                         F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 10000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(digit_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_tok_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(score, 2).alias("score"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """-> (id, fp): order-sensitive rolling hash over tokens —
    fp = fold(tokens, acc -> (acc*1000003 + h(tok)) mod 2^31-1) with
    h(tok) = ascii(first char)*256 + len(tok).  Detects exact
    token-sequence duplicates independent of whitespace/punct layout."""
    toks = tokens_array_expr(F.col(text_col))
    h = lambda x: (F.ascii(F.substring(x, 1, 1)) * 256 + F.length(x)) % F.lit(FP_MOD)  # noqa: E731
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_MUL + h(x)) % F.lit(FP_MOD),
    )
    return df.select(F.col(id_col).alias("id"), fp.alias("fp"))


def bigram_pmi(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Collocation extraction: adjacent-bigram pointwise mutual
    information over the analyzed token stream.

    ``pmi(a,b) = log2( (c_ab / N_b) / ((c_a / N_u) * (c_b / N_u)) )``
    with ``c_ab`` the adjacent-pair count, ``c_x`` unigram counts,
    ``N_b``/``N_u`` the total bigram/unigram counts.  ``min_count``
    drops rare pairs (PMI's well-known low-frequency bias).

    Plan shape: one tokenize pass staged as arrays, bigrams from a
    ``zip_with`` of the array with its own tail (no self-join), one
    explode + two aggregations — all counts are partial-agg'd map-side.
    -> (term_a, term_b, n, pmi) for pairs with n >= min_count.
    """
    arr = tokens_array_expr(F.col(text_col))
    pairs = F.when(
        F.size(arr) >= 2,
        F.zip_with(
            F.slice(arr, 1, F.size(arr) - 1),
            F.slice(arr, 2, F.size(arr) - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    toks = df.select(arr.alias("_arr"), pairs.alias("_pairs"))
    uni = (
        toks.select(F.explode("_arr").alias("t"))
        .groupBy("t").agg(F.count("*").cast("long").alias("c"))
    )
    bi = (
        toks.select(F.explode("_pairs").alias("p"))
        .select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
        .groupBy("term_a", "term_b").agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    totals = toks.select(
        F.sum(F.size("_arr")).cast("double").alias("_nu"),
        F.sum(F.size("_pairs")).cast("double").alias("_nb"),
    )
    ln2 = 0.6931471805599453
    return (
        # unigram joins left to Catalyst/AQE: the vocabulary usually fits
        # the broadcast threshold but is not guaranteed to at 100 TB
        bi.join(uni.withColumnRenamed("t", "term_a")
                .withColumnRenamed("c", "_ca"), "term_a")
        .join(uni.withColumnRenamed("t", "term_b")
              .withColumnRenamed("c", "_cb"), "term_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "term_a", "term_b", "n",
            (F.log((F.col("n") / F.col("_nb"))
                   / ((F.col("_ca") / F.col("_nu")) * (F.col("_cb") / F.col("_nu"))))
             / F.lit(ln2)).alias("pmi"),
        )
    )


def tfidf_keywords(
    postings: DataFrame,
    terms: DataFrame,
    n_docs: int,
    k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: top-``k`` terms by
    ``tf · log2(N / df)`` — the standard tf-idf salience cut a
    training-data pipeline uses for doc tagging / topic sampling.

    -> (doc_id, term, rank, w) with rank 1..k per doc.

    Plan shape: broadcast df join onto the postings, ONE window shuffle
    partitioned by doc_id (per-doc top-k — never a global sort).  The
    cut orders by ``round(w, 9)`` then term — an engine-independent
    boundary (double products differ in ulps across engines; same
    convention as the Rocchio cuts).  ``idf >= 0`` always (df <= N),
    so no signed-zero exposure.
    """
    from pyspark.sql import Window
    import math

    w = (
        postings.join(F.broadcast(terms.select("term", "df")), "term")
        .withColumn(
            "w",
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
            / F.lit(math.log(2.0)),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("w", 9)), F.asc("term"))
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", "w")
    )


def repetition_ratio(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Gopher-style repetition quality signal: the fraction of
    DUPLICATE n-grams in the document's token stream
    (``1 - distinct_ngrams / total_ngrams``; 0.0 for docs shorter than
    ``n`` tokens).  High values flag boilerplate / degenerate text a
    training-data pipeline drops or down-samples.

    Pure column expressions (tokenize once, slide an n-window with
    ``transform`` + ``slice`` — no explode, no shuffle at all).
    -> (id, n_grams, rep_ratio).
    """
    toks = tokens_array_expr(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    ratio = F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"),
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col).alias("id"),
        total.cast("long").alias("n_grams"),
        F.round(ratio, 4).alias("rep_ratio"),
    )


#: PII patterns restricted to the regex subset Java (Spark) and RE2
#: (DuckDB) interpret identically: char classes, bounded repeats, \b.
#: Count/replace order is fixed; counts are per-pattern on the ORIGINAL
#: text (an overlapping span counts once per pattern that matches it).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII scrubbing for training-data curation: replace emails, IPv4
    addresses and NANP-style phone numbers with typed placeholder
    tokens and report per-kind match counts.

    -> (id, n_email, n_ip, n_phone, redacted).

    Pure column expressions (``regexp_extract_all`` + chained
    ``regexp_replace``) — whole-stage codegen, zero shuffle, so the
    pass is scan-bound at any corpus size.  Idempotent: placeholders
    contain no characters any pattern matches.
    """
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    red = t
    for _, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    return df.select(F.col(id_col).alias("id"), *counts, red.alias("redacted"))


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus's OWN
    MLE unigram model: ``p(t) = cf_t / total_tokens``, score =
    mean_t ln p(t) — the corpus-internal analog of the LM-perplexity
    quality filter LLM pipelines run (CCNet-style), with no external
    model: a doc full of corpus-rare tokens (OCR noise, gibberish,
    wrong-language) scores far below the corpus mode, a doc of only
    head tokens scores near it; both tails are removal candidates.

    -> (id, n_tokens, mean_logprob).

    Plan: one token explode pre-aggregated to per-(id, tok) tf FIRST
    (round-6 verdict note: joining the raw token stream against the
    model keys the join on the Zipf-skewed ``tok`` — if vocab ever
    outgrows broadcast, the head token's partition is pathological; the
    (id, tok) pre-aggregation is identical semantics and strictly fewer
    rows).  The tf table then feeds BOTH the model aggregation (groupBy
    tok — one exchange, reused) and the scoring join; the per-doc mean
    is the tf-weighted mean ``Σ tf·ln p / Σ tf``.  The model table is
    |vocab|-sized — broadcast when it fits, plain shuffle join
    otherwise; the normalizing total is a broadcast 1-row aggregate of
    the model itself, in-plan (no driver action)."""
    doc_tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_array_expr(F.col(text_col))).alias("tok"),
        )
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    model = doc_tf.groupBy("tok").agg(F.sum("tf").alias("cf"))
    total = model.agg(F.sum("cf").cast("double").alias("_tot"))
    scored = (
        doc_tf.join(model, "tok")
        .crossJoin(F.broadcast(total))
        .select("id", "tf",
                (F.col("tf") * F.log(F.col("cf") / F.col("_tot"))).alias("_lp"))
    )
    return (
        scored.groupBy("id")
        .agg(F.sum("tf").cast("long").alias("n_tokens"),
             F.round(F.sum("_lp") / F.sum("tf"), 4).alias("mean_logprob"))
    )


#: The-Stack-style code-file curation thresholds (Kocetkov et al. 2022,
#: "The Stack"; also used by StarCoder's preprocessing): files with any
#: line over 1000 chars, mean line length over 100, alphanumeric
#: fraction under 0.25, or an autogenerated marker are dropped from
#: training sets — they are minified bundles, datafiles, or generated
#: code, not human-written source.
CODE_MAX_LINE_LEN = 1000
CODE_AVG_LINE_LEN = 100.0
CODE_MIN_ALNUM_FRAC = 0.25
CODE_AUTOGEN_MARKERS = ("DO NOT EDIT", "@generated", "Autogenerated by")


def code_quality(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stack-style code-file quality signals + keep/drop decision.

    -> (id, n_lines, max_line_len, avg_line_len, alnum_frac, autogen,
    keep).  Pure column expressions over one ``split('\\n')`` — per-line
    stats come from ``transform``/``array_max``/``aggregate`` on the
    line array (no explode, no shuffle: the whole filter is a map-side
    projection, which is exactly what a 100-TB curation pass wants).

    ``alnum_frac`` counts ``[A-Za-z0-9]`` over total chars;
    ``autogen`` is a marker containment check (case-sensitive, as the
    published filters are).  ``keep`` ANDs the four rules above."""
    lines = F.split(F.col(text_col), "\n")
    lens = F.transform(lines, lambda s: F.length(s))
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9]", ""))
    autogen = None
    for m in CODE_AUTOGEN_MARKERS:
        c = F.col(text_col).contains(m)
        autogen = c if autogen is None else (autogen | c)
    out = df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.coalesce(F.array_max(lens), F.lit(0)).cast("long").alias("max_line_len"),
        F.round(
            F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x)
            / F.greatest(F.size(lines), F.lit(1)), 4).alias("avg_line_len"),
        F.round(n_alnum / F.greatest(n_chars, F.lit(1)), 4).alias("alnum_frac"),
        autogen.alias("autogen"),
    )
    return out.withColumn(
        "keep",
        (F.col("max_line_len") <= CODE_MAX_LINE_LEN)
        & (F.col("avg_line_len") <= CODE_AVG_LINE_LEN)
        & (F.col("alnum_frac") >= CODE_MIN_ALNUM_FRAC)
        & ~F.col("autogen"),
    )
