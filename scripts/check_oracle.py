"""Local mimic of the driver's DuckDB oracle gate.

Runs every registered query both on Spark and on DuckDB (views over the
same parquet), compares row count, sorted column names, and an
order-insensitive value multiset. Usage:

    python scripts/check_oracle.py [sf_dir] [--curated] [name ...]

``--curated`` checks the driver-facing 50-entry registry (merged demos,
exactly what __spark_entry__.queries() exposes) instead of the full one.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind in "iuf":
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    curated = "--curated" in args
    args = [a for a in args if a != "--curated"]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from findtextcenternet_spark.plans import curated_registry, full_registry
    from findtextcenternet_spark.sources.session import get_spark

    registry = curated_registry if curated else full_registry

    spark = get_spark(app="oracle-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    reg = registry()
    n_pass = n_fail = n_nosql = 0
    for name, (fn, sql) in sorted(reg.items()):
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            n_nosql += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} vs "
                  f"{sorted(want.columns)}")
            n_fail += 1
            continue
        a, b = canon(got), canon(want)
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())} differing rows; first:")
            print(pd.concat([a[neq].head(3), b[neq].head(3)],
                            keys=["spark", "duck"]).to_string()[:800])
            n_fail += 1
            continue
        print(f"PASS {name}: {len(got)} rows")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_nosql} rows-only ==")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
