#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir> [--strict]

For each query dir under verifyOutDir: load the Spark parquet, run the
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, compare
(column names sorted, rows sorted, values exact).

Two render modes:
  default  — floats via %.9g (loose; historical behavior)
  --strict — raw repr() of every value, no rounding: catches the
             type-boundary mismatches the driver's hash catches (int64 vs
             HUGEINT-as-float, decimal-width differences) that %.9g hides.

The gate also FAILS (not skips) when a query listed in queries.json has no
output dir — a crashed query must not silently shrink the gate.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
strict = "--strict" in sys.argv[3:]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
qlist_path = f"{out_dir}/_queries.json"
expected = set(json.load(open(qlist_path))) if os.path.exists(qlist_path) else set()

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if not strict and isinstance(v, float):
                vals.append(f"{v:.9g}")
            else:
                vals.append(repr(v) if strict else str(v))
        rows.append("\x1f".join(vals))
    return cols, sorted(rows)

n_pass = n_fail = n_skip = 0
found = set()
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(qdir)
    found.add(name)
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
    sdt = {c: str(spark_df[c].dtype) for c in spark_df.columns}
    ddt = {c: str(duck_df[c].dtype) for c in duck_df.columns}
    if sdt != ddt:
        print(f"WARN  {name:28s} pandas dtypes differ: spark={sdt} duck={ddt}")
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

# every declared query must have produced an output dir (ADVICE: a throwing
# query must fail the gate, not shrink it)
missing = expected - found
for name in sorted(missing):
    print(f"FAIL  {name:28s} declared in queries.json but no output dir (query crashed?)")
    n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
sys.exit(1 if n_fail else 0)
