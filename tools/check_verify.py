#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (tooling only, not shipped).

Runs graft.Verify output against DuckDB oracles:
  1. expects Verify to have written outDir/<name>/ parquet + outDir/oracle_sql.json
  2. registers the sf parquet tables as DuckDB views
  3. runs each oracle SQL, compares schema (sorted column names), row count,
     and a hash of all values (columns sorted by name, rows sorted by all cols)

Usage: python3 tools/check_verify.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df):
    # columns sorted by name; rows sorted by stringified tuple
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(f"select * from '{pdir}/*.parquet'").fetchdf()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: {e}")
            n_fail += 1
            continue
        sc, sr = canon(spark_df)
        dc, dr = canon(duck_df)
        if sc != dc:
            print(f"[FAIL] {name}: schema {sc} != {dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"[FAIL] {name}: rows {len(sr)} != {len(dr)}")
            print("  spark head:", sr[:2])
            print("  duck  head:", dr[:2])
            n_fail += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
            print(f"[FAIL] {name}: {len(diffs)} row diffs of {len(sr)}")
            for a, b in diffs[:3]:
                print("  spark:", a)
                print("  duck :", b)
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(sr)} rows")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
