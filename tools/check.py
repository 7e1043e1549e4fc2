#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Faithful to the driver's compare (CORRECTNESS_r*.json semantics), which
the previous version of this tool was NOT — it fetched both sides via
DuckDB `fetchall()`, which canonicalizes Decimal and list values the same
way on both sides and therefore masked the exact failure modes the driver
sees. The driver:

  * loads the SPARK side with pyarrow -> pandas (so DECIMAL(38,x) columns
    arrive as `decimal.Decimal('253942.00')` objects, trailing zeros kept);
  * loads the ORACLE side with duckdb `.df()` (so DECIMAL sums arrive as
    float64 `253942.0`);
  * sorts columns by name, sorts rows by all columns via pandas
    `sort_values` (which THROWS `unhashable type: numpy.ndarray` on any
    array-typed column -> scored `err`);
  * compares stringified cells.

So: a Spark DECIMAL output vs a DuckDB float oracle fails on any cell whose
last decimal digit is zero, and any array-typed output column is an outright
error. This replica reproduces both.
"""
import sys, json, glob

import duckdb
import pandas as pd
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> list:
    """Driver-style canonical form: column-name-sorted, row-sorted via
    pandas sort_values (raises on unhashable cells, like the driver),
    stringified cells."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)]


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    names = sorted(set(list(oracle.keys()) +
                       [p.split("/")[-1] for p in glob.glob(f"{OUT}/*")
                        if not p.endswith(".json")]))
    for name in names:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        # Spark side: pyarrow -> pandas, exactly like the driver. Decimals
        # stay decimal.Decimal; arrays become numpy.ndarray cells.
        sdf = pq.read_table(f"{OUT}/{name}").to_pandas()
        if name not in oracle:
            results[name] = f"rows-only ({len(sdf)} rows)"
            continue
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            results[name] = (f"SCHEMA MISMATCH spark={sorted(sdf.columns)} "
                             f"oracle={sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            results[name] = f"ROWS MISMATCH spark={len(sdf)} oracle={len(odf)}"
            continue
        try:
            cs, co = canon(sdf), canon(odf)
        except Exception as e:
            # The driver scores this as `err` — e.g. an array-typed output
            # column makes pandas sort_values throw.
            results[name] = f"ERR (driver would score err): {type(e).__name__}: {e}"
            continue
        if cs != co:
            bad = next(i for i, (a, b) in enumerate(zip(cs, co)) if a != b)
            results[name] = (f"HASH MISMATCH first diff row {bad}:\n"
                             f"    spark : {cs[bad]}\n    oracle: {co[bad]}")
            continue
        results[name] = f"OK ({len(sdf)} rows)"
    npass = sum(1 for v in results.values()
                if v.startswith("OK") or v.startswith("rows-only"))
    for k, v in results.items():
        flag = "PASS" if v.startswith("OK") or v.startswith("rows-only") else "FAIL"
        print(f"[{flag}] {k}: {v}")
    print(f"== {npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
