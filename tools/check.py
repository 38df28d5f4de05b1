#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare (rows / schema / values) against
the Verify.scala parquet dumps. Exact equality on values after sorting
columns by name (mirrors the driver's hash compare)."""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, name)
    if not os.path.isdir(p):
        continue
    files = glob.glob(f"{p}/*.parquet")
    if not files:
        results[name] = {"status": "NO_OUTPUT"}
        continue
    got = pd.read_parquet(p)
    if name not in oracle:
        results[name] = {"status": "ROWS_ONLY", "rows": len(got)}
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = {"status": "ORACLE_ERROR", "err": str(e)[:300]}
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    entry = {"rows": f"{len(got)}/{len(exp)}",
             "cols_match": list(got.columns) == list(exp.columns)}
    if list(got.columns) != list(exp.columns):
        entry["status"] = "COLS_MISMATCH"
        entry["got_cols"] = list(got.columns)
        entry["exp_cols"] = list(exp.columns)
    elif len(got) != len(exp):
        entry["status"] = "ROWCOUNT_MISMATCH"
    else:
        mismatches = []
        for c in got.columns:
            g, e = got[c].values, exp[c].values
            try:
                if g.dtype != e.dtype:
                    mismatches.append(f"{c}: dtype {g.dtype} vs {e.dtype}")
                gg = pd.Series(g); ee = pd.Series(e)
                neq = ~((gg == ee) | (gg.isna() & ee.isna()))
                if neq.any():
                    i = int(np.argmax(neq.values))
                    mismatches.append(f"{c}: {int(neq.sum())} diffs, first@{i}: {g[i]!r} vs {e[i]!r}")
            except Exception as ex:
                mismatches.append(f"{c}: compare error {ex}")
        entry["status"] = "OK" if not mismatches else "VALUE_MISMATCH"
        if mismatches:
            entry["mismatches"] = mismatches[:6]
    results[name] = entry

ok = sum(1 for v in results.values() if v.get("status") == "OK")
rows_only = sum(1 for v in results.values() if v.get("status") == "ROWS_ONLY")
print(json.dumps(results, indent=1, default=str))
print(f"\n== {ok} OK, {rows_only} rows-only, "
      f"{len(results) - ok - rows_only} problems, {len(results)} total ==")
