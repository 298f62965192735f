#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare (sorted columns, sorted rows)
against the Spark parquet dumps written by graft.Verify."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    try:
        exp = con.execute(sql).fetchdf()
        got = duckdb.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(exp.columns)}")
            fail += 1; continue
        def canon(df):
            return sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))
        ce, cg = canon(exp), canon(got)
        if ce == cg:
            print(f"ok   {name}: {len(ce)} rows"); ok += 1
        else:
            print(f"FAIL {name}: rows spark={len(cg)} oracle={len(ce)}")
            diff1 = [r for r in cg if r not in set(ce)][:3]
            diff2 = [r for r in ce if r not in set(cg)][:3]
            print(f"     spark-only: {diff1}\n     oracle-only: {diff2}")
            fail += 1
    except Exception as e:
        print(f"ERR  {name}: {e}"); fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
