"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``information_retrieval_system_spark/``; the
query/oracle registry is ``entry_queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from information_retrieval_system_spark import entry_queries as EQ
from information_retrieval_system_spark.config import EngineConfig
from information_retrieval_system_spark.index.builder import build_index
from information_retrieval_system_spark.query import scoring
from information_retrieval_system_spark.analysis.analyzer import analyze_query_terms


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full-config (stopwords +
    Porter) BM25 top-20 for the reference-style query "spark join merge"."""
    cfg = EngineConfig()  # stemmer + stopwords ON, k1=1.2 b=0.75
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    index = build_index(docs, cfg, doc_col="doc_id", text_col="text")
    qt = analyze_query_terms(spark, "spark join merge", cfg)
    return scoring.bm25_search(index, qt, k=20, cfg=cfg)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
