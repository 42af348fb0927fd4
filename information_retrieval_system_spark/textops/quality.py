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
