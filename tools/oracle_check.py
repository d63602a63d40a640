#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Reads /tmp/graft_verify/<query> parquet dumps (written by graft.Verify),
runs each oracle_sql.json entry in DuckDB over the same sf tables, and
compares column-sorted, row-sorted values. Dev-loop tool only — the
driver runs its own equivalent.
"""
import duckdb, json, math, sys
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        got, exp = canon(pd.read_parquet(f"{OUT}/{name}")), canon(con.sql(sql).df())
        if list(got.columns) != list(exp.columns):
            fails.append((name, f"cols {list(got.columns)} vs {list(exp.columns)}"))
            continue
        if len(got) != len(exp):
            fails.append((name, f"rows {len(got)} vs {len(exp)}"))
            continue
        bad = None
        for c in got.columns:
            for x, y in zip(got[c].tolist(), exp[c].tolist()):
                same = x == y or (isinstance(x, float) and isinstance(y, float)
                                  and math.isnan(x) and math.isnan(y))
                if not same:
                    bad = f"col {c}: {x!r} != {y!r}"
                    break
            if bad:
                break
        if bad:
            fails.append((name, bad))
        else:
            print(f"OK   {name} ({len(got)} rows)")
    except Exception as ex:
        fails.append((name, f"EXC {type(ex).__name__}: {str(ex)[:200]}"))

for f in fails:
    print("FAIL", f)
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-matched")
sys.exit(1 if fails else 0)
