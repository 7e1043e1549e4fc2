#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads each parquet result dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables registered as views
over the sfDir parquet files), and compares: row count, column names,
and a hash over column-name-sorted, row-sorted values.
"""
import sys, json, glob, math, decimal, datetime

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(set(list(oracle.keys()) +
                           [p.split("/")[-1] for p in glob.glob(f"{OUT}/*")
                            if not p.endswith(".json")])):
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        sr = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        scols, srows = sr.columns, sr.fetchall()
        if name not in oracle:
            results[name] = f"rows-only ({len(srows)} rows)"
            continue
        try:
            orr = con.sql(oracle[name])
            ocols, orows = orr.columns, orr.fetchall()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
            continue
        if len(srows) != len(orows):
            results[name] = f"ROWS MISMATCH spark={len(srows)} oracle={len(orows)}"
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            bad = next(i for i, (a, b) in enumerate(zip(cs, co)) if a != b)
            results[name] = (f"HASH MISMATCH first diff row {bad}:\n"
                             f"    spark : {cs[bad]}\n    oracle: {co[bad]}")
            continue
        results[name] = f"OK ({len(srows)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
    for k, v in results.items():
        flag = "PASS" if v.startswith("OK") or v.startswith("rows-only") else "FAIL"
        print(f"[{flag}] {k}: {v}")
    print(f"== {npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
