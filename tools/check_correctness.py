#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sf_dir> <verify_out_dir> [timeout_s]

Runs each oracle_sql.json entry in DuckDB over the same parquet tables and
compares (rows, column names, values) against the Verify parquet dumps,
column-sorted like the driver does. Strictly for local iteration — the
driver runs its own copy of this logic.

Optional timeout_s (default: none) interrupts any single oracle that runs
longer and reports it as TIMEOUT rather than hanging the whole check: the
dedup family's oracles are EXHAUSTIVE all-pairs ground truth (that is what
makes them oracles), so they are O(n²) by design and intractable past the
sf0.01 gate corpus — the engine exists precisely because the oracle's plan
shape doesn't scale. A TIMEOUT at a scale decade is expected for that
family, not a failure; the result counts them separately.
"""
import sys, os, json, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sfdir, outdir, timeout_s=None):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        # driver testdata is a single file; Spark-written (SfScale) is a dir
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_total = n_timeout = 0
    for name in sorted(os.listdir(outdir)):
        if name == "oracle_sql.json":
            continue
        n_total += 1
        spark_df = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"{name}: rows-only ({len(spark_df)} rows)")
            n_ok += 1
            continue
        timer = None
        timed_out = []
        # Each oracle runs on its OWN cursor (a separate connection to the
        # same in-memory catalog): if the oracle finishes just as the timer
        # fires, cancel() comes too late and the stray interrupt would
        # otherwise abort the NEXT oracle on a shared connection (spurious
        # ORACLE ERR). Interrupting a per-query cursor cannot leak across
        # queries; the done-guard additionally keeps a completed query from
        # being misreported as a timeout.
        cur = con.cursor()
        done = threading.Event()
        guard = threading.Lock()
        if timeout_s:
            def fire(c=cur):
                with guard:
                    if not done.is_set():
                        timed_out.append(True)
                        c.interrupt()
            timer = threading.Timer(timeout_s, fire)
            timer.start()
        try:
            odf = cur.sql(oracle[name]).df()
        except Exception as e:
            if timed_out:
                print(f"{name}: TIMEOUT (oracle > {timeout_s}s at this SF)")
                n_timeout += 1
            else:
                print(f"{name}: ORACLE ERR {e}")
            continue
        finally:
            with guard:
                done.set()
            if timer:
                timer.cancel()
            cur.close()
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
    suffix = f" ({n_timeout} oracle-timeout)" if n_timeout else ""
    print(f"{n_ok}/{n_total} ok{suffix}")
    return 0 if n_ok + n_timeout == n_total else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else None))
