#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's oracle_sql.json
in DuckDB over the same sf dir and compare with the Spark parquet outputs
(column-name-sorted, row-sorted, NaN-safe). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
NOT part of the shipped library - dev tooling only (driver-side python).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        exp = norm(con.execute(sql).df())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    try:
        got = norm(con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df())
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fails += 1
        continue
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != oracle {list(exp.columns)}")
        fails += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
        fails += 1
        continue
    ok = True
    for c in exp.columns:
        a, b = exp[c], got[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            bad = ~((a == b) | (a.isna() & b.isna()))
        else:
            try:
                bad = ~(a.astype(str) == b.astype(str))
            except Exception:
                bad = pd.Series([True])
        if bad.any():
            i = bad.idxmax()
            print(f"FAIL {name}: col {c} differs at row {i}: oracle={a[i]!r} spark={b[i]!r}")
            ok = False
            fails += 1
            break
    if ok:
        print(f"OK   {name} ({len(exp)} rows)")

extra = [d.split('/')[-1] for d in glob.glob(f"{outdir}/*") if not d.endswith('.json')
         and d.split('/')[-1] not in oracle]
for name in sorted(extra):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')").fetchone()[0]
    print(f"ROWS {name}: {n} rows (no oracle)")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
