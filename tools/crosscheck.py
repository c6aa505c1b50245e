#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet, run the
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, compare
(column names sorted, rows sorted, values rounded-insensitive exact).
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        rows.append("\x1f".join(vals))
    return cols, sorted(rows)

n_pass = n_fail = n_skip = 0
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(qdir)
    spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    if name not in oracle:
        print(f"SKIP  {name:28s} rows={len(spark_df)} (rows-only check)")
        n_skip += 1
        if len(spark_df) == 0:
            print(f"  !! rows-only query returned 0 rows")
            n_fail += 1
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL  {name:28s} oracle SQL error: {e}")
        n_fail += 1
        continue
    sc, sr = canon(spark_df)
    dc, dr = canon(duck_df)
    if sc != dc:
        print(f"FAIL  {name:28s} columns differ: spark={sc} duck={dc}")
        n_fail += 1
    elif sr != dr:
        diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        print(f"FAIL  {name:28s} rows differ: spark={len(sr)} duck={len(dr)}; first diffs: {diff}")
        if len(sr) != len(dr):
            only_s = set(sr) - set(dr)
            only_d = set(dr) - set(sr)
            print(f"      only-spark({len(only_s)}): {sorted(only_s)[:2]}")
            print(f"      only-duck({len(only_d)}): {sorted(only_d)[:2]}")
        n_fail += 1
    else:
        print(f"PASS  {name:28s} rows={len(sr)}")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
sys.exit(1 if n_fail else 0)
