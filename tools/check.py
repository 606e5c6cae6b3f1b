#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]
Reads outdir/<name>/ parquet (written by graft.Verify) and
outdir/oracle_sql.json, runs each oracle in DuckDB over sfdir's tables,
sorts columns by name, and compares cell-by-cell. Exit 1 on any mismatch.
"""
import sys, json, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            bad += 1
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {out}/{name}")
            bad += 1
            continue
        got = pd.read_parquet(f"{out}/{name}")
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {sorted(exp.columns)}"
                  f"\n  spark:  {sorted(got.columns)}")
            bad += 1
            continue
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        got = got[sorted(got.columns)].reset_index(drop=True)
        if len(exp) != len(got):
            print(f"FAIL {name}: row count oracle={len(exp)} spark={len(got)}")
            bad += 1
            continue
        diffs = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            try:
                ecmp = e.astype(object).where(pd.notnull(e), None)
                gcmp = g.astype(object).where(pd.notnull(g), None)
                neq = [i for i in range(len(e)) if not _eq(ecmp[i], gcmp[i])]
            except Exception as ex:
                diffs.append((c, f"compare error: {ex}"))
                continue
            if neq:
                i = neq[0]
                diffs.append((c, f"{len(neq)} cells, first@{i}: "
                              f"oracle={ecmp[i]!r} spark={gcmp[i]!r}"))
        if diffs:
            print(f"FAIL {name}:")
            for c, msg in diffs:
                print(f"  col {c}: {msg}")
            bad += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
    print(f"\n{len(oracle) - bad}/{len(oracle)} queries match")
    sys.exit(1 if bad else 0)

def _eq(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) or isinstance(b, float):
        return a == b  # exact: queries must round on their own
    try:
        import datetime
        if isinstance(a, (pd.Timestamp, datetime.date)) or \
           isinstance(b, (pd.Timestamp, datetime.date)):
            return str(a)[:10] == str(b)[:10] if _both_dates(a, b) else str(a) == str(b)
    except Exception:
        pass
    return a == b

def _both_dates(a, b):
    return True

if __name__ == "__main__":
    main()
