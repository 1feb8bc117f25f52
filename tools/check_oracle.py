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
import sys, os, json, glob, re
import multiprocessing as mp
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# --- iterative closure oracle -------------------------------------------
# The connected-component oracles (q57/q77/q114/q115) express transitive
# closure as a recursive reach-SET CTE: r(id, reach) enumerates every
# (node, reachable-node) pair, O(sum |component|^2) rows — exact and fine
# at sf0.01/sf0.1, intractable at sf1 (20M edges). When an oracle contains
# that CTE we rewrite it: materialize `edges` into a temp table, run
# min-label propagation WITH pointer jumping (rep <- rep(rep), so
# convergence is O(log diameter) rounds, each a plain join), and splice
# the resulting (id, rep) closure back into the remaining SQL. Same
# ground truth, different (still Spark-independent) algorithm.
_CLOSURE_CTE = re.compile(
    r",\s*r\(id, reach\) AS \(.*?JOIN r ON e\d*\.dst = r\.id\)", re.S)
_CL_FROM_R = re.compile(
    r"cl AS \(SELECT id, min\(reach\) AS rep FROM r GROUP BY id\)")
_FINAL_FROM_R = re.compile(
    r"SELECT id AS (\w+), min\(reach\) AS (\w+)\s+FROM r GROUP BY id")

def _closure_rewrite(sql):
    """Return (edges_sql, final_sql) if `sql` uses the recursive reach-set
    closure, else None. edges_sql materializes the symmetric edge list;
    final_sql is the original query with the closure CTE replaced by a
    read of the __closure temp table (id, rep)."""
    m = _CLOSURE_CTE.search(sql)
    if m is None:
        return None
    prefix = sql[:m.start()]          # ends exactly at the edges CTE
    assert "edges AS" in prefix, "closure CTE not preceded by edges CTE"
    edges_sql = (prefix.replace("WITH RECURSIVE", "WITH", 1)
                 + "\nSELECT src, dst FROM edges")
    rest = prefix + sql[m.end():]
    rest = rest.replace("WITH RECURSIVE", "WITH", 1)
    rest, n_cl = _CL_FROM_R.subn("cl AS (SELECT id, rep FROM __closure)", rest)
    rest, n_fin = _FINAL_FROM_R.subn(
        r"SELECT id AS \1, rep AS \2 FROM __closure", rest)
    assert n_cl + n_fin == 1, f"unexpected closure consumer shape ({n_cl},{n_fin})"
    return edges_sql, rest

def _propagate_closure(con):
    """Min-label propagation over __edges into __closure(id, rep)."""
    con.sql("""CREATE OR REPLACE TEMP TABLE __lab AS
               SELECT DISTINCT src AS id, src AS rep FROM __edges""")
    while True:
        # one hop: rep <- min(rep, min over neighbors' rep)
        con.sql("""CREATE OR REPLACE TEMP TABLE __next AS
            SELECT l.id, least(l.rep, coalesce(m.mn, l.rep)) AS rep
            FROM __lab l LEFT JOIN (
              SELECT e.src AS id, min(l2.rep) AS mn
              FROM __edges e JOIN __lab l2 ON l2.id = e.dst
              GROUP BY 1) m ON m.id = l.id""")
        # pointer jumping: rep <- rep(rep) (reps are node ids, always in __next)
        con.sql("""CREATE OR REPLACE TEMP TABLE __jump AS
            SELECT l.id, l2.rep AS rep
            FROM __next l JOIN __next l2 ON l2.id = l.rep""")
        changed = con.sql("""SELECT count(*) FROM __jump n
            JOIN __lab l ON l.id = n.id AND l.rep <> n.rep""").fetchone()[0]
        con.sql("CREATE OR REPLACE TEMP TABLE __lab AS SELECT * FROM __jump")
        if changed == 0:
            break
    con.sql("CREATE OR REPLACE TEMP TABLE __closure AS SELECT id, rep FROM __lab")

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
    rewritten = _closure_rewrite(sql)
    if rewritten is not None:
        edges_sql, final_sql = rewritten
        con.sql(f"CREATE TEMP TABLE __edges AS {edges_sql}")
        _propagate_closure(con)
        sql = final_sql
    rel = con.sql(sql)
    # Type-discipline guard (the q161 lesson): the driver's value hash is
    # TYPE-sensitive, while this comparator's float-coercion branch below
    # is not — a DuckDB HUGEINT (sum over BIGINT, uncast) fetches as
    # float64 and silently "matches" a Spark BIGINT here while failing
    # the driver's hash. Enforce the repo rule (integer-valued oracle
    # outputs CAST to BIGINT) mechanically before comparing values.
    bad = [f"{n}:{t}" for n, t in zip(rel.columns, map(str, rel.types))
           if str(t).upper() in ("HUGEINT", "UHUGEINT", "INT128", "UINT128")]
    if bad:
        return ("fail", f"oracle emits non-portable integer type(s) {bad}: "
                        "CAST to BIGINT (driver hash is type-sensitive)")
    oracle_df = rel.fetchdf()
    spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
    oracle_df = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(spark_df.columns) != list(oracle_df.columns):
        return ("fail", f"columns {list(spark_df.columns)} vs {list(oracle_df.columns)}")
    if spark_df.shape != oracle_df.shape:
        return ("fail", f"shape {spark_df.shape} vs {oracle_df.shape}")
    for c in spark_df.columns:
        a, b = spark_df[c], oracle_df[c]
        # integer-vs-float dtype split = the two engines disagree on the
        # column's TYPE; the driver hash fails this even when every value
        # coincides numerically — so fail it here too instead of coercing
        if (pd.api.types.is_integer_dtype(a) != pd.api.types.is_integer_dtype(b)
                and (pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b))):
            return ("fail", f"col {c} dtype mismatch: {a.dtype} vs {b.dtype} "
                            "(driver hash is type-sensitive)")
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
        try:
            # p has exited, but guard against a worker that died without
            # enqueueing (native DuckDB crash, OOM kill): a bare q.get()
            # would block the whole sweep forever.
            status, detail = q.get(timeout=5)
        except Exception:
            status, detail = "fail", f"worker died without result (exitcode {p.exitcode})"
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
            status, detail = _compare_inline(sf_dir, out_dir, name, oracles[name])
        except Exception as e:
            status, detail = "fail", str(e)
        if status == "ok":
            print(f"OK   {name}: {detail} rows")
        else:
            print(f"FAIL {name}: {detail}")
            failures += 1
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    if len(sys.argv) > 3:
        sys.exit(main_budget(sys.argv[1], sys.argv[2], float(sys.argv[3])))
    sys.exit(main(sys.argv[1], sys.argv[2]))
