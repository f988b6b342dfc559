"""Local driver-sim: exact-value compare of queries() entries vs their
DuckDB oracles, mirroring the round driver's gate. Usage:
  python3 tools/driver_sim.py sf_dir name1 name2 ...
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

import __spark_entry__ as entrymod
from interference_spark import build_spark

sf = sys.argv[1]
names = sys.argv[2:]

spark = build_spark(app_name="driver-sim", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for t in entrymod.inventory.TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

QS, OS = entrymod.queries(), entrymod.oracle_sql()


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), x) for x in t))


fail = 0
for name in names:
    df = QS[name](spark, sf)
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]
    res = con.execute(OS[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    ok_cols = sorted(scols) == sorted(dcols)
    ok_rows = len(srows) == len(drows)
    got = _sorted_rows(scols, srows)
    want = _sorted_rows(dcols, drows)
    ok_vals = got == want
    print(f"{name}: cols={ok_cols} rows={ok_rows}({len(srows)}/{len(drows)}) values={ok_vals}")
    if not (ok_cols and ok_rows and ok_vals):
        fail += 1
        diffs = [(g, w) for g, w in zip(got, want) if g != w]
        print("  first diffs:", diffs[:3])
print("FAIL" if fail else "ALL GREEN", fail)
sys.exit(1 if fail else 0)
