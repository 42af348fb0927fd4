"""Signed-zero immunization (round-5): the driver's value-hash
distinguishes IEEE ``-0.0`` from ``+0.0``, and Spark's ``F.round`` /
DuckDB's ``round`` disagree on which zero a tiny negative rounds to
(the round-4 ``bigram_pmi`` red row).  Two guarantees:

1. engine side: ``canon_float_cols`` wraps EVERY registry query, so no
   Spark result can carry ``-0.0`` in a top-level float column;
2. oracle side: no registry oracle emits ``-0.0`` at the driver's
   grading scale (sf0.01) — DuckDB-only sweep, no Spark involved.
"""

from __future__ import annotations

import numpy as np


def test_canon_float_cols_flips_negative_zero(spark):
    from pyspark.sql import functions as F

    from information_retrieval_system_spark.entry_queries import canon_float_cols

    df = spark.createDataFrame(
        [(-0.0, 1, None), (2.5, 2, -0.0), (-3.25, 3, 0.0)],
        "score double, k long, aux double",
    )
    out = canon_float_cols(df).toPandas()
    # non-float column untouched, names/order preserved
    assert list(out.columns) == ["score", "k", "aux"]
    for c in ("score", "aux"):
        vals = out[c].to_numpy()
        mask = np.isfinite(vals.astype(float)) if vals.dtype.kind == "f" else None
        zneg = (vals == 0.0) & np.signbit(vals.astype(float))
        assert not zneg.any(), f"-0.0 survived in {c}"
    # values are otherwise exact (x + 0.0 is the identity off -0.0)
    assert sorted(v for v in out["score"]) == [-3.25, 0.0, 2.5]
    assert out["aux"].isna().sum() == 1  # NULL stays NULL


def test_registry_queries_are_canon_wrapped():
    from information_retrieval_system_spark import entry_queries as EQ

    for name, fn in EQ.QUERIES.items():
        assert hasattr(fn, "__wrapped__"), f"{name} not canon-wrapped"


def test_no_negative_zero_in_any_oracle_at_sf001():
    """DuckDB-only sweep of every registry oracle at the driver's
    grading scale: no float output cell may be -0.0."""
    import duckdb

    from information_retrieval_system_spark import entry_queries as EQ

    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
        )
    offenders = []
    for name, sql in EQ.ORACLES.items():
        if sql is None:
            continue
        df = con.sql(sql).df()
        for c in df.columns:
            if df[c].dtype.kind == "f":
                v = df[c].to_numpy()
                if ((v == 0.0) & np.signbit(v)).any():
                    offenders.append((name, c))
    assert not offenders, f"oracles emitting -0.0 at sf0.01: {offenders}"
