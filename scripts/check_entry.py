"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at the given sf dir alongside its
oracle_sql() twin in DuckDB; compares row count, sorted column names, and
order-insensitive values (floats rounded to 6dp before comparison).

Usage: python scripts/check_entry.py [sf_dir] [name1,name2,...]
(the optional second arg restricts the sweep to the named queries)
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from pgvectorscale_spark.session import get_spark
from pgvectorscale_spark.sources.tables import TABLE_NAMES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].map(lambda x: str(x))
    return df.sort_values(cols).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("check_entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    if len(sys.argv) > 2:
        keep = set(sys.argv[2].split(","))
        unknown = keep - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 2
        qs = {k: v for k, v in qs.items() if k in keep}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(got)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            exp = con.execute(sqls[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            continue
        g, x = normalize(got), normalize(exp)
        status = None
        if sorted(got.columns) != sorted(exp.columns):
            status = f"schema {sorted(got.columns)} vs {sorted(exp.columns)}"
        elif len(g) != len(x):
            status = f"rows {len(g)} vs {len(x)}"
        elif not g.equals(x):
            diff = (g != x).any(axis=1)
            status = f"values ({int(diff.sum())}/{len(g)} rows differ)\n{g[diff].head(3)}\nvs\n{x[diff].head(3)}"
        if status:
            failures.append(name)
            print(f"FAIL {name}: {status}")
        else:
            print(f"ok   {name}: {len(g)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
