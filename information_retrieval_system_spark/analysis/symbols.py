"""Symbol extraction over source-code content (ctags-lite).

Code-search engines rank symbol DEFINITIONS above plain content matches
(Zoekt ships universal-ctags for this; GitHub code search exposes
``symbol:`` qualifiers).  This module extracts definition sites with a
small language-agnostic pattern set — ``def``/``class`` (Python),
``function`` (JS), ``func`` (Go) — as pure JVM regexps, one pass over
the content:

- every pattern's matches are collected with ``regexp_extract_all``
  (capture group 1 = the identifier), tagged with their kind via
  ``transform`` into an array of structs, concatenated across patterns,
  and exploded ONCE — a single projection per doc, no UDF, no second
  scan per pattern.
- ``(doc, kind, symbol)`` definition counts aggregate with one
  partial-aggregable shuffle; symbol lookup is a filter + that same
  aggregation restricted by the predicate pushed to the scan.

The reference engine has no code-symbol notion (it tokenizes documents
as flat text); this is part of the code-payload extension layer, like
the trigram index and the identifier subtoken analyzer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: (kind, java-and-RE2-compatible pattern); group 1 captures the
#: identifier.  Leading ``\n`` anchors each form to a line start without
#: inline flags (kept to the Java∩RE2 subset so the DuckDB oracle can
#: run the very same strings).
SYMBOL_PATTERNS: tuple[tuple[str, str], ...] = (
    ("function", r"\n\s*def\s+([A-Za-z_][A-Za-z0-9_]*)\s*\("),
    ("class", r"\n\s*class\s+([A-Za-z_][A-Za-z0-9_]*)"),
    ("function", r"\nfunction\s+([A-Za-z_][A-Za-z0-9_]*)\s*\("),
    ("function", r"\nfunc\s+([A-Za-z_][A-Za-z0-9_]*)\s*\("),
)


def _tagger(kind: str):
    # a ONE-parameter lambda per kind: a two-param lambda would make
    # F.transform pass the array index as the second argument
    return lambda s: F.struct(F.lit(kind).alias("kind"), s.alias("symbol"))


def _symbol_structs_expr(col: F.Column) -> F.Column:
    """array<struct<kind,symbol>> of every definition in ``col`` —
    all patterns evaluated in ONE projection."""
    parts = [
        F.transform(F.regexp_extract_all(col, F.lit(pat), F.lit(1)),
                    _tagger(kind))
        for kind, pat in SYMBOL_PATTERNS
    ]
    return F.concat(*parts)


def extract_symbols(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """-> ``(doc_id, kind, symbol, n_defs)``: definition sites per doc.

    ``n_defs`` counts repeated definitions of the same name in one doc
    (overload sets / re-definitions), which symbol ranking uses as a
    weight."""
    sym = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_symbol_structs_expr(F.col(text_col))).alias("s"),
    ).select("doc_id", "s.kind", "s.symbol")
    return (sym.groupBy("doc_id", "kind", "symbol")
            .agg(F.count("*").cast("long").alias("n_defs")))


def symbol_search(df: DataFrame, text_col: str, id_col: str,
                  symbol: str) -> DataFrame:
    """Docs DEFINING ``symbol`` -> (doc_id, kind, n_defs), the
    ``symbol:`` qualifier.  At serving scale run this against a
    persisted ``extract_symbols`` table partitioned by a symbol-hash
    bucket (same layout contract as the term/gram buckets) — the
    extraction pass is build-side, not per-query."""
    return (extract_symbols(df, text_col, id_col)
            .filter(F.col("symbol") == symbol)
            .select("doc_id", "kind", "n_defs"))


def write_symbol_index(symbols: DataFrame, path: str,
                       symbol_buckets: int = 16) -> None:
    """Persist the ``extract_symbols`` table partitioned by
    ``sbucket = pmod(hash(symbol), B)`` — a symbol lookup scans one
    bucket (the term/gram bucket layout contract)."""
    (symbols
     .withColumn("sbucket", F.pmod(F.hash("symbol"), F.lit(symbol_buckets)))
     .repartition("sbucket")
     .write.mode("overwrite")
     .partitionBy("sbucket")
     .parquet(path))


def read_symbol_index(df_or_spark, path: str) -> DataFrame:
    """Read the bucketed symbol layout back (keeps ``sbucket``)."""
    spark = df_or_spark if hasattr(df_or_spark, "read") else df_or_spark.sparkSession
    return spark.read.parquet(path)


def symbol_search_served(symbols: DataFrame, symbol: str,
                         symbol_buckets: int | None = None) -> DataFrame:
    """``symbol:`` lookup against the PERSISTED layout: partition-filter
    on the symbol's bucket, then the equality predicate (pushed to the
    parquet scan).  -> (doc_id, kind, n_defs)."""
    s = symbols
    if symbol_buckets is not None and "sbucket" in s.columns:
        spark = s.sparkSession
        b = int(spark.range(1).select(
            F.pmod(F.hash(F.lit(symbol)), F.lit(symbol_buckets)).alias("b")
        ).first()["b"])
        s = s.filter(F.col("sbucket") == b)
    return (s.filter(F.col("symbol") == symbol)
            .select("doc_id", "kind", "n_defs"))
