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
            if not _dtype_ok(e, g):
                diffs.append((c, f"dtype oracle={e.dtype} spark={g.dtype}"))
                continue
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

def _dtype_ok(e, g):
    """Driver-faithful dtype gate: float64 vs int64 is a FAIL (DuckDB
    HUGEINT sums surface as float64; Spark emits int64 — the driver's
    hash compare is representation-strict). datetime64 resolution
    (ns vs us) is tolerated; everything else must match exactly."""
    de, dg = str(e.dtype), str(g.dtype)
    if de == dg:
        return True
    if de.startswith("datetime64") and dg.startswith("datetime64"):
        return True
    # DuckDB CAST(strptime(..) AS DATE) surfaces as datetime64 while Spark
    # DATE parquet loads as object(datetime.date); cell compare (below)
    # still requires the timestamp to be exactly midnight of that date.
    if (de.startswith("datetime64") or de == "object") and \
       (dg.startswith("datetime64") or dg == "object"):
        return True
    return False

def _eq(a, b):
    import datetime
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    a_pure_date = isinstance(a, datetime.date) and \
        not isinstance(a, (datetime.datetime, pd.Timestamp))
    b_pure_date = isinstance(b, datetime.date) and \
        not isinstance(b, (datetime.datetime, pd.Timestamp))
    if a_pure_date and b_pure_date:
        return str(a) == str(b)
    if a_pure_date != b_pure_date and (a_pure_date or b_pure_date):
        # date vs timestamp: equal only if the timestamp is midnight of
        # that exact date (DuckDB date-typed results surface as Timestamps)
        ts, d = (b, a) if a_pure_date else (a, b)
        if isinstance(ts, (pd.Timestamp, datetime.datetime)):
            return ts.time() == datetime.time(0, 0) and ts.date() == d
        return False
    a_ts = isinstance(a, (pd.Timestamp, datetime.datetime))
    b_ts = isinstance(b, (pd.Timestamp, datetime.datetime))
    if a_ts != b_ts:
        # timestamp vs anything else (e.g. a formatted STRING) is a type
        # mismatch — the driver's hash compare would fail it, so must we
        return False
    if a_ts and b_ts:
        # full-precision compare; only genuine date-vs-date may truncate
        return str(a) == str(b)
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, float) != isinstance(b, float):
        return False  # float64(42.0) == int64(42) must NOT pass
    if isinstance(a, float):
        return a == b  # exact: queries must round on their own
    return a == b

if __name__ == "__main__":
    main()
