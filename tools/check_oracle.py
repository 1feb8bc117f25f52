#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the oracle SQL in DuckDB and diff values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [perQueryBudgetSec]
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)

With a budget, each oracle runs in a subprocess killed after the budget
and reported as SKIP (budget) — for large scale factors (sf1) where a few
recursive-closure/pair-join oracles take tens of minutes in DuckDB and
would otherwise starve the rest of the sweep. SKIPs are not failures;
they are listed so the reader knows exactly what was not checked.
"""
import sys, os, json, glob
import multiprocessing as mp
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def _compare_one(sf_dir, out_dir, name, sql, q):
    """Subprocess worker: returns ('ok', rows) / ('fail', msg)."""
    try:
        q.put(_compare_inline(sf_dir, out_dir, name, sql))
    except Exception as e:
        q.put(("fail", str(e)))

def _connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con

def _compare_inline(sf_dir, out_dir, name, sql):
    import pandas as pd
    con = _connect(sf_dir)
    pq = os.path.join(out_dir, name)
    spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
    oracle_df = con.sql(sql).fetchdf()
    spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
    oracle_df = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(spark_df.columns) != list(oracle_df.columns):
        return ("fail", f"columns {list(spark_df.columns)} vs {list(oracle_df.columns)}")
    if spark_df.shape != oracle_df.shape:
        return ("fail", f"shape {spark_df.shape} vs {oracle_df.shape}")
    for c in spark_df.columns:
        a, b = spark_df[c], oracle_df[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            eq = (a.astype(float).fillna(-1e308) == b.astype(float).fillna(-1e308)).all()
        else:
            eq = (a.astype(str) == b.astype(str)).all()
        if not eq:
            idx = (a.astype(str) != b.astype(str)).idxmax()
            return ("fail", f"col {c} first diff at row {idx}: {a[idx]!r} vs {b[idx]!r}")
    return ("ok", spark_df.shape[0])

def main_budget(sf_dir, out_dir, budget):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures, skipped = 0, []
    for name in sorted(oracles):
        pq = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(pq, "*.parquet")):
            print(f"FAIL {name}: no parquet output", flush=True)
            failures += 1
            continue
        q = mp.Queue()
        p = mp.Process(target=_compare_one,
                       args=(sf_dir, out_dir, name, oracles[name], q))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate(); p.join()
            print(f"SKIP {name}: oracle exceeded {budget}s budget", flush=True)
            skipped.append(name)
            continue
        status, detail = q.get()
        if status == "ok":
            print(f"OK   {name}: {detail} rows", flush=True)
        else:
            print(f"FAIL {name}: {detail}", flush=True)
            failures += 1
    checked = len(oracles) - len(skipped)
    print(f"\n{checked - failures}/{checked} checked queries match"
          + (f"; skipped over budget: {skipped}" if skipped else ""))
    return 1 if failures else 0

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver tables are single files; ScaleUp/Spark-written tables are
        # directories of part files — accept both
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(oracles):
        pq = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(pq, "*.parquet")):
            print(f"FAIL {name}: no parquet output")
            failures += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
            oracle_df = con.sql(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        # driver-style compare: sort columns by name, compare shapes + values
        spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
        oracle_df = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
        if list(spark_df.columns) != list(oracle_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(oracle_df.columns)}")
            failures += 1
            continue
        if spark_df.shape != oracle_df.shape:
            print(f"FAIL {name}: shape {spark_df.shape} vs {oracle_df.shape}")
            failures += 1
            continue
        mismatch = None
        for c in spark_df.columns:
            a, b = spark_df[c], oracle_df[c]
            try:
                import pandas as pd
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    eq = (a.astype(float).fillna(-1e308) == b.astype(float).fillna(-1e308)).all()
                else:
                    eq = (a.astype(str) == b.astype(str)).all()
            except Exception as e:
                eq = False
            if not eq:
                idx = (a.astype(str) != b.astype(str)).idxmax()
                mismatch = f"col {c} first diff at row {idx}: {a[idx]!r} vs {b[idx]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            failures += 1
        else:
            print(f"OK   {name}: {spark_df.shape[0]} rows")
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    if len(sys.argv) > 3:
        sys.exit(main_budget(sys.argv[1], sys.argv[2], float(sys.argv[3])))
    sys.exit(main(sys.argv[1], sys.argv[2]))
