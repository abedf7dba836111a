#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run graft.Verify
(via sbt) on a sf dir, then re-run each oracleSql in DuckDB over the
same parquet tables and compare row-sets.  Usage:
    python3 tools/oracle_check.py [sfdir] [--skip-verify] [--only=a,b]
        [--out=FILE.json] [--timeout=SECS] [--memlimit=24GB]
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
if ONLY and "--skip-verify" not in sys.argv:
    OUT += "_only"  # never mix a filtered VERIFY dump with a full one
    # (--skip-verify --only reuses the existing FULL dump and just
    # filters the comparison — the retry path for flaky/heavy oracles)

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

# --memlimit=N caps DuckDB's memory (e.g. --memlimit=24GB) with disk
# spill — without it, one pathological oracle at a big sf can balloon
# to all of RAM and the kernel OOM-kills the WHOLE gate with no record
# written (observed on the first r12 sf1 run: 128 GB anon-rss).
# preserve_insertion_order=false lowers materialization memory; order
# never matters here (rows_of sorts).
MEMLIMIT = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--memlimit=")), None)
if MEMLIMIT:
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute(f"SET memory_limit='{MEMLIMIT}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET preserve_insertion_order=false")

# --timeout=SECS bounds each DUCKDB oracle execution (the r12 sf1
# ritual: some oracles are deliberately quadratic in corpus size —
# exact all-pairs verification CTEs — and a 10x sf step can push them
# past any sane wall budget; a timed-out oracle is recorded as a LOUD
# skip with the reason, never a silent pass or a code failure).
TIMEOUT = next((float(a.split("=", 1)[1]) for a in sys.argv
                if a.startswith("--timeout=")), None)

# --heavy=name:secs,name:secs grants NAMED oracles a larger per-entry
# budget than --timeout (r12 verdict item 6: the known-heavy
# verification CTEs — deliberately quadratic all-pairs checks, graph
# fixpoints — deserve a documented longer budget at big sf instead of
# a frozen skip list; every grant is visible on the command line that
# produced the committed record). Only meaningful alongside --timeout.
HEAVY = {}
for a in sys.argv:
    if a.startswith("--heavy="):
        for kv in a.split("=", 1)[1].split(","):
            k, v = kv.split(":")
            HEAVY[k] = float(v)

def budget_for(name):
    return HEAVY.get(name, TIMEOUT)

class OracleTimeout(Exception):
    pass

def exec_df(sql, tmo=None):
    tmo = tmo if tmo is not None else TIMEOUT
    if tmo is None:
        return con.execute(sql).df()
    import threading
    box = {}
    def run():
        try:
            box["df"] = con.execute(sql).df()
        except Exception as e:
            box["err"] = e
    t = threading.Thread(target=run, daemon=True)
    t.start(); t.join(tmo)
    if t.is_alive():
        con.interrupt()
        # wait for the interrupt to actually land: proceeding while the
        # worker still runs would use the connection from two threads
        # AND stack zombie queries' memory (the r12 sf1 OOM)
        t.join(600)
        if t.is_alive():
            print("FATAL: interrupted oracle did not stop; aborting the "
                  "gate rather than corrupting the connection", flush=True)
            os._exit(3)
        raise OracleTimeout(f"oracle timeout: exceeded {tmo:.0f}s in DuckDB at this sf")
    if "err" in box:
        raise box["err"]
    return box["df"]
def make_views(c):
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        # driver testdata ships single parquet FILES; GenScale corpora
        # are Spark-written DIRECTORIES — glob those
        if os.path.isdir(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

make_views(con)

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

def note(line):
    # flushed immediately so a long run (sf1) shows live progress and a
    # killed run still leaves evidence of WHERE it died
    print(line, flush=True)
# per-name record of what each comparison stage ACTUALLY established:
# schema_match = sorted column names equal; rows_match = row counts
# equal; rowset_match = full normalized row-set equality (this replica
# compares complete value tuples — stronger than a hash). A stage not
# reached stays None.
stages = {}

def blank_stage():
    return {"schema_match": None, "rows_match": None, "rowset_match": None,
            "spark_rows": None, "oracle_rows": None}

def compare_one(name, sql, c, exec_oracle):
    """Full comparison of one entry on connection `c`.
    Returns (kind, payload, stage-dict): kind PASS (payload=row count),
    FAIL or SKIP (payload=message)."""
    st = blank_stage()
    spark_dir = f"{OUT}/{name}"
    if not glob.glob(f"{spark_dir}/*.parquet"):
        return ("FAIL", "no spark output", st)
    try:
        # .df() (not fetchall) so values carry the same pandas dtypes the
        # driver sees: HUGEINT->float64, BIGINT->int64, DECIMAL->float64
        sdf = c.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        ddf = exec_oracle(sql)
    except OracleTimeout as e:
        return ("SKIP", str(e), st)
    except Exception as e:
        # a DuckDB out-of-memory under --memlimit is the same class as
        # a timeout: the oracle is too expensive at this sf — a loud
        # resource skip, not a correctness verdict
        if "Out of Memory" in str(e):
            return ("SKIP", f"oracle resource-capped: {str(e)[:160]}", st)
        return ("FAIL", f"exec error: {str(e)[:200]}", st)
    st["spark_rows"], st["oracle_rows"] = len(sdf), len(ddf)
    st["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
    if not st["schema_match"]:
        return ("FAIL", f"schema: spark={list(sdf.columns)} duck={list(ddf.columns)}", st)
    try:
        srows, drows = rows_of(sdf), rows_of(ddf)
    except Unhashable as e:
        return ("FAIL", str(e), st)
    st["rows_match"] = len(srows) == len(drows)
    if not st["rows_match"]:
        return ("FAIL", f"rowcount: spark={len(srows)} duck={len(drows)}", st)
    st["rowset_match"] = srows == drows
    if not st["rowset_match"]:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
        return ("FAIL", f"values differ at row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}", st)
    return ("PASS", len(srows), st)

# --isolate runs EVERY oracle in its own subprocess with a hard kill on
# timeout — the only reliable bound: an in-process con.interrupt() can
# be ignored indefinitely by a query stuck inside a spilling operator
# (observed at sf1: dedup_containment sat 600 s past the interrupt),
# and a runaway oracle's memory then belongs to the gate process
# itself. A killed child's memory is reclaimed by the kernel, the
# parent's connection is never shared, and the per-child view setup is
# milliseconds.
ISOLATE = "--isolate" in sys.argv

def child_main(name, sql, q):
    c = duckdb.connect()
    if MEMLIMIT:
        os.makedirs("/tmp/duckdb_spill", exist_ok=True)
        c.execute(f"SET memory_limit='{MEMLIMIT}'")
        c.execute("SET temp_directory='/tmp/duckdb_spill'")
        c.execute("SET preserve_insertion_order=false")
    make_views(c)
    q.put(compare_one(name, sql, c, lambda s: c.execute(s).df()))

def compare_isolated(name, sql):
    import multiprocessing as mp, queue as _q, time as _t
    tmo = budget_for(name)
    q = mp.Queue()
    p = mp.Process(target=child_main, args=(name, sql, q), daemon=True)
    p.start()
    deadline = _t.time() + (tmo if tmo else 86400)
    while True:
        try:
            res = q.get(timeout=2); break
        except _q.Empty:
            if not p.is_alive():
                try:
                    res = q.get(timeout=2); break
                except _q.Empty:
                    if p.exitcode == -9:
                        # the kernel OOM-killed the child: some DuckDB
                        # operators under-account and blow past
                        # memory_limit — same class as a timeout, a
                        # loud resource skip, never a correctness FAIL
                        return ("SKIP", "oracle resource-capped: child "
                                        "OOM-killed by the kernel at this sf",
                                blank_stage())
                    return ("FAIL", f"oracle child crashed (exit {p.exitcode})",
                            blank_stage())
            if _t.time() > deadline:
                p.kill(); p.join()
                return ("SKIP", f"oracle timeout: exceeded {tmo:.0f}s in "
                                "DuckDB at this sf (child killed)",
                        blank_stage())
    p.join()
    return res

# --out=FILE writes the run as a committable JSON record (the r9
# verdict item 2 ritual: the sf0.1 full gate is a standing per-round
# artifact, CORRECTNESS_r{N}_sf0.1.json). Written INCREMENTALLY after
# every entry (with "complete": false until the loop ends) so a killed
# long run still leaves an honest partial artifact.
OUT_JSON = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--out=")), None)
def write_record(complete):
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
    # keep the first ~3 lines of a failure message (newlines folded):
    # 'values differ' carries the spark/duck row values on lines 2-3,
    # and truncating to line 1 left r12's one real sf1 mismatch
    # undiagnosable from the committed record (r12 ADVICE item 2)
    def fold(m):
        return " | ".join(l.strip() for l in m.splitlines()[:3])[:600]
    rec = {n: record(n, None) for n, _ in passes}
    rec.update({n: record(n, fold(m)) for n, m in fails})
    rec.update({n: record(n, fold(m)) for n, m in skips})
    top = {"format": 3, "sf": SF, "complete": complete,
           "n_pass": len(passes), "n_fail": len(fails),
           "n_skip": len(skips), "queries": dict(sorted(rec.items()))}
    tmp_path = OUT_JSON + ".tmp"
    with open(tmp_path, "w") as f:
        json.dump(top, f, indent=1)
    os.replace(tmp_path, OUT_JSON)
    if complete:
        print(f"record written: {OUT_JSON}")


ONLY_SET = set(ONLY.split(",")) if ONLY else None
for name, sql in sorted(oracle.items()):
    if ONLY_SET is not None and name not in ONLY_SET:
        continue  # retry path: full dump, filtered comparison
    if ISOLATE:
        kind, payload, st = compare_isolated(name, sql)
    else:
        kind, payload, st = compare_one(
            name, sql, con, lambda s, n=name: exec_df(s, budget_for(n)))
    stages[name] = st
    if kind == "PASS":
        passes.append((name, payload)); note(f"PASS {name} ({payload} rows)")
    elif kind == "SKIP":
        skips.append((name, payload)); note(f"SKIP {name}: {payload}")
    else:
        fails.append((name, payload))
        note(f"FAIL {name}: {payload.splitlines()[0][:160]}")
    if OUT_JSON:
        write_record(complete=False)

if OUT_JSON:
    write_record(complete=True)

for n, m in skips: print(f"SKIP {n}: {m}")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail / {len(skips)} timeout-skip")
# exit codes: 1 = any hash/schema/row FAIL; 2 = no fails but ≥1
# resource skip (the gate is only PARTIALLY verified — a consumer
# keying on the exit code must not read a largely-skipped run as
# green, r12 ADVICE item 3); 0 = fully verified.
sys.exit(1 if fails else (2 if skips else 0))
