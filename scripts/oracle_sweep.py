"""One-off oracle parity sweep at an arbitrary SF (the driver pins sf0.01
for CORRECTNESS_r*.json; this replays the same compare at 10x to show the
parity is not an artifact of the small fixture). Usage:
    python scripts/oracle_sweep.py [sf_dir]
Prints one JSON line per query + a summary line."""
import json
import os
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

import duckdb

from pgvectorscale_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("oracle-sweep", master="local[16]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e  # noqa: E402

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

qs, osql = e.queries(), e.oracle_sql()
ok = bad = weak = 0
for name, fn in qs.items():
    rec = {"q": name}
    try:
        sdf = fn(spark, sf).toPandas()
        if name in osql:
            odf = con.execute(osql[name]).df()
            cols = sorted(sdf.columns)
            s = sdf[cols].sort_values(cols).round(6).reset_index(drop=True)
            o = odf[cols].sort_values(cols).round(6).reset_index(drop=True)
            match = bool(
                s.shape == o.shape
                and sorted(sdf.columns) == sorted(odf.columns)
                and (s.astype(str).values == o.astype(str).values).all()
            )
            rec.update(rows=len(s), oracle_rows=len(o), match=match)
            ok += match
            bad += not match
        else:
            rec.update(rows=len(sdf), match=None)  # rows-only (non-SQL op)
            weak += 1
    except Exception as ex:  # noqa: BLE001
        rec.update(err=f"{type(ex).__name__}: {ex}"[:300])
        bad += 1
    print(json.dumps(rec), flush=True)
print(json.dumps({"summary": True, "sf": sf, "match": ok, "mismatch_or_err": bad,
                  "rows_only": weak, "total": len(qs)}), flush=True)
spark.stop()
