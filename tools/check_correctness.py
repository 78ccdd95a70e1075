#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: compare each
Verify-dumped parquet against its DuckDB oracle on the same sf dir."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        results[name] = "MISSING_SPARK_OUTPUT"
        continue
    try:
        sp = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
        spark_cols = sorted(sp.columns)
        sp_rows = con.sql(
            f"SELECT {', '.join(spark_cols)} FROM '{spark_path}/*.parquet' ORDER BY ALL"
        ).fetchall()
    except Exception as e:
        results[name] = f"SPARK_READ_FAIL: {e}"
        continue
    try:
        oc = con.sql(sql)
        oracle_cols = sorted(oc.columns)
        oc_rows = con.sql(
            f"SELECT {', '.join(oracle_cols)} FROM ({sql}) ORDER BY ALL"
        ).fetchall()
    except Exception as e:
        results[name] = f"ORACLE_FAIL: {str(e)[:200]}"
        continue
    if spark_cols != oracle_cols:
        results[name] = f"SCHEMA_MISMATCH: spark={spark_cols} oracle={oracle_cols}"
    elif len(sp_rows) != len(oc_rows):
        results[name] = f"ROWCOUNT_MISMATCH: spark={len(sp_rows)} oracle={len(oc_rows)}"
    else:
        bad = None
        for i, (a, b) in enumerate(zip(sp_rows, oc_rows)):
            if a != b:
                bad = (i, a, b)
                break
        results[name] = "OK" if bad is None else f"VALUE_MISMATCH at {bad[0]}: spark={bad[1]} oracle={bad[2]}"

ok = sum(1 for v in results.values() if v == "OK")
for name, v in sorted(results.items()):
    print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + str(v)[:300]))
print(f"\n{ok}/{len(results)} OK")
