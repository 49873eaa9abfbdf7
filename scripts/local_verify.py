#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF dir, then replay each oracle SQL in DuckDB over the same parquet
tables and compare (row count, schema names, sorted-values equality).

Usage: python3 scripts/local_verify.py [sfDir] [outDir] [query ...]
"""
import json, sys, math
import duckdb, pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "target/verify-out"
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        got = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: spark output missing: {e}"); continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle sql error: {e}"); continue
    if sorted(got.columns) != sorted(exp.columns):
        fails.append(name)
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        continue
    if len(got) != len(exp):
        fails.append(name)
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        continue
    g, e = canon(got), canon(exp)
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                eq = ((gv.isna() & ev.isna()) | (gv == ev)).all()
            else:
                eq = gv.astype(object).where(pd.notna(gv), None).equals(
                     ev.astype(object).where(pd.notna(ev), None))
        except Exception as ex:
            eq = False
        if not eq:
            bad = c
            break
    if bad is not None:
        fails.append(name)
        print(f"FAIL {name}: column '{bad}' differs")
        m = (g[bad] != e[bad]) if g[bad].dtype.kind != 'O' else ~(g[bad].astype(str) == e[bad].astype(str))
        idx = m[m].index[:5] if m.any() else g.index[:5]
        print(pd.concat([g.loc[idx].add_prefix('got_'), e.loc[idx].add_prefix('exp_')], axis=1).to_string())
    else:
        print(f"ok   {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass" if not only else "")
sys.exit(1 if fails else 0)
