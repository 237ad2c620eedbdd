#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Verify dump."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")], ignore_index=True) \
        if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        results[name] = f"rows-only: {len(spark_df)} rows"
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {str(e)[:200]}"
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(o.columns):
        results[name] = f"COLUMN MISMATCH spark={list(s.columns)} duck={list(o.columns)}"
        continue
    if len(s) != len(o):
        results[name] = f"ROWCOUNT MISMATCH spark={len(s)} duck={len(o)}"
        continue
    s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
    o = o.sort_values(by=list(o.columns), kind="mergesort").reset_index(drop=True)
    ok = True
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if sv.dtype.kind == 'f' or ov.dtype.kind == 'f':
            eq = np.array_equal(sv.astype('float64'), ov.astype('float64'))
        else:
            eq = (sv == ov).all() if len(sv) else True
        if not eq:
            bad = np.where(sv != ov)[0][:3] if len(sv) else []
            results[name] = f"VALUE MISMATCH col={c} rows={list(bad)} spark={sv[bad][:3] if len(bad) else ''} duck={ov[bad][:3] if len(bad) else ''}"
            ok = False
            break
    if ok:
        results[name] = f"OK ({len(s)} rows)"
n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
for k, v in results.items():
    flag = "PASS" if (v.startswith("OK") or v.startswith("rows-only")) else "FAIL"
    print(f"{flag} {k}: {v}")
print(f"== {n_ok}/{len(results)} pass")
