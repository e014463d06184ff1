#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sf_dir> <verify_out_dir>

Runs each oracle_sql.json entry in DuckDB over the same parquet tables and
compares (rows, column names, values) against the Verify parquet dumps,
column-sorted like the driver does. Strictly for local iteration — the
driver runs its own copy of this logic.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_total = 0
    for name in sorted(os.listdir(outdir)):
        if name == "oracle_sql.json":
            continue
        n_total += 1
        spark_df = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"{name}: rows-only ({len(spark_df)} rows)")
            n_ok += 1
            continue
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            continue
        s, o = canon(spark_df), canon(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        try:
            values = s.astype(str).equals(o.astype(str))
        except Exception:
            values = False
        if rows and schema and values:
            n_ok += 1
        else:
            print(f"{name}: rows={rows} schema={schema} values={values} "
                  f"({len(s)}/{len(o)})")
    print(f"{n_ok}/{n_total} ok")
    return 0 if n_ok == n_total else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
