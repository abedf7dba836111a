#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run graft.Verify
(via sbt) on a sf dir, then re-run each oracleSql in DuckDB over the
same parquet tables and compare row-sets.  Usage:
    python3 tools/oracle_check.py [sfdir] [--skip-verify]
"""
import json, math, os, subprocess, sys, glob

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
# OUT is keyed by the sf dir so --skip-verify can never silently compare
# stale Spark outputs from a different scale factor.
OUT = f"/tmp/graft_verify_{os.path.basename(SF.rstrip('/'))}"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines() if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

import duckdb
import pyarrow.parquet as pq

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"): return v.isoformat()  # full µs precision
    if isinstance(v, list): return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{OUT}/{name}"
    if not glob.glob(f"{spark_dir}/*.parquet"):
        fails.append((name, "no spark output")); continue
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
        scols = [d[0] for d in con.description]
        ddf = con.execute(sql).fetchall()
        dcols = [d[0] for d in con.description]
    except Exception as e:
        fails.append((name, f"exec error: {str(e)[:200]}")); continue
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"schema: spark={scols} duck={dcols}")); continue
    # driver sorts columns by name before hashing values
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    srows = sorted(tuple(norm(r[i]) for i in sidx) for r in sdf)
    drows = sorted(tuple(norm(r[i]) for i in didx) for r in ddf)
    if len(srows) != len(drows):
        fails.append((name, f"rowcount: spark={len(srows)} duck={len(drows)}")); continue
    if srows != drows:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
        fails.append((name, f"values differ at row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")); continue
    passes.append((name, len(srows)))

for n, c in passes: print(f"PASS {n} ({c} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
