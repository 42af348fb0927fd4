"""Mirror of the driver's correctness gate: run every __spark_entry__
queries()[name] on Spark and oracle_sql()[name] on DuckDB at the given
sf dir, compare row-count + schema + order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from information_retrieval_system_spark.session import get_spark

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            failures += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {str(ex)[:300]}")
            failures += 1
            continue
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            # the driver's value-hash distinguishes -0.0 from +0.0 but
            # atol treats them equal — check sign bits separately so a
            # signed-zero divergence fails HERE, not only in the driver
            szero = []
            for c in a.columns:
                av, bv = a[c], b[c]
                if av.dtype.kind == "f" and bv.dtype.kind == "f":
                    import numpy as np

                    mask = av.notna() & bv.notna()
                    if (np.signbit(av[mask].to_numpy())
                            != np.signbit(bv[mask].to_numpy())).any():
                        szero.append(c)
            if szero:
                print(f"FAIL {name}: signed-zero divergence in {szero}")
                failures += 1
            else:
                print(f"OK   {name}: {len(a)} rows")
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch: {str(ex)[:400]}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
