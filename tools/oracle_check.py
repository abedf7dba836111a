#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run graft.Verify
(via sbt) on a sf dir, then re-run each oracleSql in DuckDB over the
same parquet tables and compare row-sets.  Usage:
    python3 tools/oracle_check.py [sfdir] [--skip-verify] [--only=a,b]
        [--out=FILE.json] [--timeout=SECS]
--out records are driver-key-compatible (rows_match/schema_match/
hash_match/spark_rows/oracle_rows/err, format 3 — see the --out block);
--timeout bounds each DuckDB oracle and records overruns as loud skips.
"""
import json, math, os, subprocess, sys, glob

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
# OUT is keyed by the sf dir so --skip-verify can never silently compare
# stale Spark outputs from a different scale factor.
OUT = f"/tmp/graft_verify_{os.path.basename(SF.rstrip('/'))}"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ONLY = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")), None)
if ONLY:
    OUT += "_only"  # never mix a filtered dump with a full one

if "--skip-verify" not in sys.argv:
    names = f" {ONLY}" if ONLY else ""
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{names}'],
        capture_output=True, text=True, cwd="/root/repo")
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines() if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

import duckdb
import numpy as np
import pandas as pd

con = duckdb.connect()

# --timeout=SECS bounds each DUCKDB oracle execution (the r12 sf1
# ritual: some oracles are deliberately quadratic in corpus size —
# exact all-pairs verification CTEs — and a 10x sf step can push them
# past any sane wall budget; a timed-out oracle is recorded as a LOUD
# skip with the reason, never a silent pass or a code failure).
TIMEOUT = next((float(a.split("=", 1)[1]) for a in sys.argv
                if a.startswith("--timeout=")), None)

class OracleTimeout(Exception):
    pass

def exec_df(sql):
    if TIMEOUT is None:
        return con.execute(sql).df()
    import threading
    box = {}
    def run():
        try:
            box["df"] = con.execute(sql).df()
        except Exception as e:
            box["err"] = e
    t = threading.Thread(target=run, daemon=True)
    t.start(); t.join(TIMEOUT)
    if t.is_alive():
        con.interrupt()
        t.join(60)
        raise OracleTimeout(f"oracle timeout: exceeded {TIMEOUT:.0f}s in DuckDB at this sf")
    if "err" in box:
        raise box["err"]
    return box["df"]
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

class Unhashable(Exception):
    pass

def norm(v):
    """Driver-strength normalization: TYPE-TAGGED and full-precision.
    The driver materializes both sides as pandas frames, so DuckDB
    HUGEINT (e.g. SUM(int)) arrives as float64 while Spark BIGINT is
    int64 — those MUST compare unequal here (5 != 5.0), and floats must
    keep full repr precision, or this replica passes code the driver
    fails (the r2 q_conditional_agg/q_sessionize blind spot)."""
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, np.ndarray):
        raise Unhashable("raw array cell (driver harness crashes on these)")
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f): return "f:nan"
        return f"f:{f!r}"
    if hasattr(v, "isoformat"): return f"t:{v.isoformat()}"  # full µs precision
    if isinstance(v, (list, tuple)):
        raise Unhashable("raw list cell (driver harness crashes on these)")
    if isinstance(v, (bytes, bytearray)):
        return f"y:{bytes(v).hex()}"
    return f"s:{v}"

def rows_of(df):
    cols = sorted(df.columns)  # driver sorts columns by name
    return sorted(tuple(norm(v) for v in row) for row in df[cols].itertuples(index=False, name=None))

fails, passes, skips = [], [], []
# per-name record of what each comparison stage ACTUALLY established:
# schema_match = sorted column names equal; rows_match = row counts
# equal; rowset_match = full normalized row-set equality (this replica
# compares complete value tuples — stronger than a hash). A stage not
# reached stays None.
stages = {}
for name, sql in sorted(oracle.items()):
    st = stages[name] = {"schema_match": None, "rows_match": None,
                         "rowset_match": None,
                         "spark_rows": None, "oracle_rows": None}
    spark_dir = f"{OUT}/{name}"
    if not glob.glob(f"{spark_dir}/*.parquet"):
        fails.append((name, "no spark output")); continue
    try:
        # .df() (not fetchall) so values carry the same pandas dtypes the
        # driver sees: HUGEINT->float64, BIGINT->int64, DECIMAL->float64
        sdf = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        ddf = exec_df(sql)
    except OracleTimeout as e:
        skips.append((name, str(e))); continue
    except Exception as e:
        fails.append((name, f"exec error: {str(e)[:200]}")); continue
    st["spark_rows"], st["oracle_rows"] = len(sdf), len(ddf)
    st["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
    if not st["schema_match"]:
        fails.append((name, f"schema: spark={list(sdf.columns)} duck={list(ddf.columns)}")); continue
    try:
        srows, drows = rows_of(sdf), rows_of(ddf)
    except Unhashable as e:
        fails.append((name, str(e))); continue
    st["rows_match"] = len(srows) == len(drows)
    if not st["rows_match"]:
        fails.append((name, f"rowcount: spark={len(srows)} duck={len(drows)}")); continue
    st["rowset_match"] = srows == drows
    if not st["rowset_match"]:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
        fails.append((name, f"values differ at row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")); continue
    passes.append((name, len(srows)))

# --out=FILE writes the run as a committable JSON record (the r9
# verdict item 2 ritual: the sf0.1 full gate is a standing per-round
# artifact, CORRECTNESS_r{N}_sf0.1.json)
OUT_JSON = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--out=")), None)
if OUT_JSON:
    # RECORD SHAPE (format 3, r12): per-query keys mirror the driver's
    # CORRECTNESS_r{N}.json exactly — rows_match / schema_match /
    # hash_match / spark_rows / oracle_rows / err — so cross-round and
    # driver-vs-local diffs are key-compatible (r11 ADVICE: the r11
    # rename to rowset_match silently broke key-diffing consumers).
    # hash_match carries this replica's rowset result: the full
    # normalized row-set comparison, STRONGER than the driver's hash —
    # rowset_match is kept as an alias naming what actually ran. Flags
    # come from the stage results the run produced, never asserted
    # wholesale (r10 ADVICE).
    def record(name, err):
        st = stages.get(name, {})
        return {"rows_match": st.get("rows_match"),
                "schema_match": st.get("schema_match"),
                "hash_match": st.get("rowset_match"),
                "rowset_match": st.get("rowset_match"),
                "spark_rows": st.get("spark_rows"),
                "oracle_rows": st.get("oracle_rows"),
                "err": err}
    rec = {n: record(n, None) for n, _ in passes}
    rec.update({n: record(n, m.splitlines()[0][:300]) for n, m in fails})
    rec.update({n: record(n, m.splitlines()[0][:300]) for n, m in skips})
    with open(OUT_JSON, "w") as f:
        json.dump({"format": 3, "sf": SF,
                   "n_pass": len(passes), "n_fail": len(fails),
                   "n_skip": len(skips),
                   "queries": dict(sorted(rec.items()))}, f, indent=1)
    print(f"record written: {OUT_JSON}")

for n, c in passes: print(f"PASS {n} ({c} rows)")
for n, m in skips: print(f"SKIP {n}: {m}")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail / {len(skips)} timeout-skip")
sys.exit(1 if fails else 0)
