#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only — the
Scala library has no python dependency).

Runs DuckDB on oracle_sql.json over the sf parquet tables and compares
with the parquet results Verify wrote. Columns sorted by name, rows
sorted by all columns, values hashed after stringify (floats via repr).
"""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes: timestamps -> iso strings, floats -> rounded repr
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(9)
        else:
            out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

import os, sys as _sys
# Prefer the NEWEST dump: a restricted Verify run into a previously-full
# outDir must be reported as the partial run it is (stale full-suite
# results would otherwise pass as a fresh full run), and a full re-run
# supersedes an older partial. Ties (1s-granularity filesystems) resolve
# toward PARTIAL — the safe direction: it verifies less, never more.
full, part = f"{out_dir}/oracle_sql.json", f"{out_dir}/oracle_sql.partial.json"
mtime = lambda p: os.path.getmtime(p) if os.path.exists(p) else -1.0
if mtime(full) < 0 and mtime(part) < 0:
    _sys.exit(f"no oracle dump in {out_dir} — run graft.Verify first")
partial_run = mtime(part) >= mtime(full)
oracle = json.load(open(part if partial_run else full))
# the partial dump's manifest of queries ITS run refreshed (may include
# rows-only queries that have no oracle entry); None for full runs and
# for partial dumps predating the manifest
refreshed = set(oracle.pop("__refreshed__", [])) or None if partial_run else None
if partial_run:
    print(f"### PARTIAL RUN: restricted oracle dump ({len(oracle)} queries); "
          f"results not refreshed by it are not checked ###")
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no spark output"); fails += 1; continue
    try:
        got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
        exp = canon(con.sql(sql).df())
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"ROWS     {name}: spark={len(got)} oracle={len(exp)}"); fails += 1; continue
    # float columns: tolerance compare (round(9) exact-equality can flip
    # on values straddling a rounding tie)
    import numpy as np
    eq = True
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(e):
            ok = np.isclose(g, e, atol=1e-9, rtol=0, equal_nan=True).all()
        else:
            ok = g.equals(e)
        if not ok:
            eq = False
            break
    if not eq:
        diff = (got != exp) & ~(got.isna() & exp.isna())
        ndiff = int(diff.values.sum())
        print(f"VALUES   {name}: {ndiff} differing cells / {got.size}")
        bad = diff.any(axis=1)
        print(pd.concat([got[bad].head(3).add_prefix("got_"),
                         exp[bad].head(3).add_prefix("exp_")], axis=1).to_string())
        fails += 1
    else:
        print(f"OK       {name}: {len(got)} rows")

# rows-only queries (no oracle). On a partial run, only dirs refreshed
# by THIS run count. The partial dump's __refreshed__ manifest says
# exactly which those are (ADVICE r6: an mtime fence vs the last FULL
# dump can't distinguish this partial run's dirs from an earlier partial
# run's leftovers); for pre-manifest dumps, fall back to that fence.
for path in sorted(glob.glob(f"{out_dir}/*/")):
    name = path.rstrip("/").split("/")[-1]
    if name in oracle: continue
    if partial_run:
        if refreshed is not None:
            if name not in refreshed: continue
        elif os.path.getmtime(path.rstrip("/")) <= mtime(full):
            continue
    files = glob.glob(f"{path}/*.parquet")
    n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
    print(f"{'OK-ROWS ' if n > 0 else 'EMPTY   '} {name}: {n} rows (no oracle)")
    if n == 0: fails += 1

print(f"\n{'FAIL' if fails else 'PASS'} ({fails} problems)")
sys.exit(1 if fails else 0)
