"""Driver-contract invariants for __spark_entry__."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E


def test_every_query_has_an_oracle():
    qs, os_ = E.queries(), E.oracle_sql()
    missing = [k for k in qs if k not in os_]
    # every operator we claim is oracle-checked (none rely on the weaker
    # rows-only path today)
    assert not missing, f"queries without oracle SQL: {missing}"
    dangling = [k for k in os_ if k not in qs]
    assert not dangling, f"oracle entries without a query: {dangling}"


def test_oracle_sql_is_duckdb_parseable():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'")
    for name, sql in E.oracle_sql().items():
        con.sql(f"EXPLAIN {sql}")  # parses + binds against the real views


def test_entry_returns_ranked_frame(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "score"]
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
