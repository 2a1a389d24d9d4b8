#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
Scala library has no python dependency). Compares each Verify output
parquet against its DuckDB oracle on the same testdata parquet."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = con.execute(f"SELECT * FROM read_parquet({files})").df()
    if name not in oracle:
        rows_only.append((name, len(got)))
        continue
    exp = con.execute(oracle[name]).df()
    # driver semantics: sort columns by name, then compare value hashes
    got_s = got[sorted(got.columns)]
    exp_s = exp[sorted(exp.columns)]
    if list(got_s.columns) != list(exp_s.columns):
        fails.append((name, f"columns {list(got_s.columns)} vs {list(exp_s.columns)}"))
        continue
    if got_s.dtypes.tolist() != exp_s.dtypes.tolist():
        fails.append((name, f"dtypes {got_s.dtypes.tolist()} vs {exp_s.dtypes.tolist()}"))
        continue
    g = got_s.sort_values(by=list(got_s.columns), ignore_index=True)
    e = exp_s.sort_values(by=list(exp_s.columns), ignore_index=True)
    if len(g) != len(e):
        fails.append((name, f"rows {len(g)} vs {len(e)}"))
        continue
    if not g.equals(e):
        diff = (g != e) & ~(g.isna() & e.isna())
        bad_cols = [c for c in g.columns if diff[c].any()]
        detail = []
        for c in bad_cols[:3]:
            i = diff[c].idxmax()
            detail.append(f"{c}[{i}]: {g[c][i]!r} vs {e[c][i]!r}")
        fails.append((name, f"values differ in {bad_cols}: {detail}"))
        continue
    passes.append(name)

for name in oracle:
    if not os.path.isdir(os.path.join(out_dir, name)):
        fails.append((name, "no output written (query failed in Verify)"))

print(f"PASS ({len(passes)}):", " ".join(passes))
print(f"ROWS-ONLY ({len(rows_only)}):", " ".join(f"{n}={r}" for n, r in rows_only))
print(f"FAIL ({len(fails)}):")
for n, why in fails:
    print(f"  {n}: {why}")
sys.exit(1 if fails else 0)
