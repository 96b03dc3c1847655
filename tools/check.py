#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output directory (parquet per query + oracle_sql.json),
runs each oracle in DuckDB against the sf parquet tables, and compares
row counts + sorted-value hashes (columns sorted by name, rows sorted).
Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import hashlib

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> str:
    # lowercase before sorting: alias case must not reorder columns
    df = df.reindex(sorted(df.columns, key=str.lower), axis=1)
    # normalize cell text: floats at fixed 4-decimal precision — the
    # oracles round to <=4 decimals themselves, so this catches genuine
    # cent-level mismatches in large aggregates that %.6g would hide
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.4f}"
        return str(v)
    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        pq = f"{out_dir}/{name}"
        if not os.path.isdir(pq):
            results[name] = "MISSING_SPARK_OUTPUT"; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{pq}/*.parquet")],
                                 ignore_index=True)
        except ValueError:
            results[name] = "EMPTY_SPARK_OUTPUT"; continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"; continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWS {len(spark_df)} vs {len(duck_df)}"; continue
        if sorted(map(str.lower, spark_df.columns)) != sorted(map(str.lower, duck_df.columns)):
            results[name] = f"COLS {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"; continue
        duck_df.columns = [c for c in duck_df.columns]
        h1, h2 = canon(spark_df), canon(duck_df)
        results[name] = "OK" if h1 == h2 else "HASH_MISMATCH"
        if h1 != h2:
            # print first differing rows for debugging
            a = spark_df.reindex(sorted(spark_df.columns), axis=1)
            b = duck_df.reindex(sorted(duck_df.columns), axis=1)
            sa = sorted(a.astype(str).apply("|".join, axis=1))
            sb = sorted(b.astype(str).apply("|".join, axis=1))
            for x, y in zip(sa, sb):
                if x != y:
                    print(f"  [{name}] spark: {x}\n  [{name}] duck : {y}")
                    break
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else 'FAIL':4} {k}: {v}")
    print(f"== {ok}/{len(results)} OK")
    sys.exit(0 if ok == len(results) else 1)

if __name__ == "__main__":
    main()
