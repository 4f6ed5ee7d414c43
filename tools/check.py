#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: compare graft.Verify parquet
dumps against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 tools/check.py [sfDir] [outDir]

Compares per query: column name sets, dtypes (warning only), and exact
values after sorting columns by name (mirrors the driver's described
hashing). Exits nonzero if any query mismatches.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    # Mirrors the driver's canonicalization: columns sorted by name, then
    # ROWS re-sorted by all columns via pandas sort_values. sort_values
    # raises TypeError on array-typed columns (unhashable ndarray) — that
    # crash IS driver behavior, so this gate must reproduce it rather than
    # stringify arrays first (which hid the r01 agg_collect/fn_array/
    # fn_map_json failures).
    df = df[sorted(df.columns)]
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def values_equal(a, b):
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    for c in a.columns:
        x, y = a[c], b[c]
        try:
            if x.dtype == object or y.dtype == object:
                xs = x.map(lambda v: str(list(v)) if isinstance(v, (list, np.ndarray)) else str(v))
                ys = y.map(lambda v: str(list(v)) if isinstance(v, (list, np.ndarray)) else str(v))
                if not xs.equals(ys):
                    bad = (xs != ys)
                    i = int(np.argmax(bad.values))
                    return False, f"col {c} row {i}: {xs.iloc[i]!r} vs {ys.iloc[i]!r}"
            elif np.issubdtype(x.dtype, np.floating) or np.issubdtype(y.dtype, np.floating):
                xa, ya = x.astype(float).values, y.astype(float).values
                neq = ~((xa == ya) | (np.isnan(xa) & np.isnan(ya)))
                if neq.any():
                    i = int(np.argmax(neq))
                    return False, f"col {c} row {i}: {xa[i]!r} vs {ya[i]!r}"
            else:
                if "datetime" in str(x.dtype) or "datetime" in str(y.dtype):
                    x = pd.to_datetime(x).astype("datetime64[ns]")
                    y = pd.to_datetime(y).astype("datetime64[ns]")
                if not x.reset_index(drop=True).equals(y.reset_index(drop=True)):
                    neq = (x.values != y.values)
                    i = int(np.argmax(neq))
                    return False, f"col {c} row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}"
        except Exception as e:
            return False, f"col {c}: compare error {e}"
    return True, ""

names = sorted([os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)])
fails, exempt = [], []
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output parquet")); continue
    sdf = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        exempt.append((name, len(sdf))); continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {str(e)[:200]}")); continue
    s, o = canon(sdf), canon(odf)
    if list(s.columns) != list(o.columns):
        fails.append((name, f"columns {list(s.columns)} vs {list(o.columns)}")); continue
    sd, od = [str(t) for t in s.dtypes], [str(t) for t in o.dtypes]
    dtw = "" if sd == od else f"  [dtype warn: {[(c, a, b) for c, a, b in zip(s.columns, sd, od) if a != b]}]"
    ok, msg = values_equal(s, o)
    if ok:
        print(f"  OK  {name} ({len(s)} rows){dtw}")
    else:
        fails.append((name, msg + dtw))
for name, n in exempt:
    print(f"  --  {name} (oracle-exempt, {n} rows)")

# machine-readable summary for tools/gen_catalog.py (the README catalog
# is generated from this + BENCH_FULL.json, never hand-edited)
summary = {}
failed_names = {name for name, _ in fails}
exempt_names = {name for name, _ in exempt}
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    rows = pq.read_table(files[0]).num_rows if files else 0
    status = ("fail" if name in failed_names
              else "exempt" if name in exempt_names else "pass")
    summary[name] = {"status": status, "rows": rows}
with open(f"{out}/check_summary.json", "w") as f:
    json.dump(summary, f, indent=0, sort_keys=True)

print()
if fails:
    print(f"FAILED {len(fails)}/{len(names)}:")
    for name, msg in fails:
        print(f"  FAIL {name}: {msg}")
    sys.exit(1)
print(f"ALL MATCH: {len(names) - len(exempt)} oracle-checked, {len(exempt)} exempt")
