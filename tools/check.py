#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same testdata parquet, and compares: column
names (sorted), dtypes (loosely), row count, and values (exact, after
sorting columns by name). Usage:

    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def values_equal(a, b) -> bool:
    if a.shape != b.shape: return False
    for col in a.columns:
        x, y = a[col], b[col]
        for xv, yv in zip(x, y):
            xn, yn = pd.isna(xv), pd.isna(yv)
            try:
                if bool(xn) != bool(yn): return False
                if not xn and xv != yv:
                    if isinstance(xv, float) and isinstance(yv, float):
                        if xv != yv: return False
                    else:
                        return False
            except (ValueError, TypeError):
                if str(xv) != str(yv): return False
    return True

def fresh_con(sf_dir):
    """One DuckDB connection per ORACLE QUERY — the big-SF x-family
    oracles each need tens of GB; running the whole surface through one
    connection accumulates buffer-pool state until mid-query mallocs
    fail, while a fresh process-wide pool per query behaves exactly like
    the (historically green) one-query-at-a-time pin runs. Memory cap +
    spill dir because DuckDB's default limit (80% of RAM) is above what
    this box's kernel will actually hand one process."""
    con = duckdb.connect()
    mem = os.environ.get("GRAFT_DUCKDB_MEM", "40GB")
    tmp = os.environ.get("GRAFT_DUCKDB_TMP", "/tmp/duckcheck")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. the sf1 refresh)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main(sf_dir, out_dir, only=None):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # optional comma-list filter for resuming interrupted sweeps
        names = set(only.split(","))
        # Two kinds of "not in oracle_sql.json" (r16 advice): a TYPO
        # (absent from the registry snapshot tools/query_names.txt) hard
        # fails — a typo'd resume list would otherwise yield an empty
        # sweep that exits 0, a vacuous "verification pass"; a VALID
        # rows-only gate (in the registry but deliberately without an
        # oracle entry) is warn-and-skipped — it has no DuckDB mirror to
        # check, and aborting the whole sweep over it punishes a correct
        # name.
        reg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "query_names.txt")
        registry = set(open(reg_path).read().split())
        typos = names - set(oracle) - registry
        if typos:
            raise SystemExit(
                f"check.py: unknown query name(s) in filter: {sorted(typos)} "
                f"— not in {out_dir}/oracle_sql.json nor {reg_path}")
        rows_only = sorted((names & registry) - set(oracle))
        if rows_only:
            print(f"WARN skipping rows-only gate(s) with no oracle entry: "
                  f"{rows_only}")
        oracle = {k: v for k, v in oracle.items() if k in names}
        if not oracle:
            raise SystemExit(
                "check.py: filter matched no oracle entries — nothing to "
                "verify (all names rows-only?)")
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracle):
        sql = oracle[name]
        pq_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{pq_dir}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; fails.append(name); continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{pq_dir}/*.parquet"))]))
            con = fresh_con(sf_dir)
            try:
                duck_df = norm(con.execute(sql).fetchdf())
            finally:
                con.close()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; fails.append(name); continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1; fails.append(name); continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1; fails.append(name); continue
        if not values_equal(spark_df, duck_df):
            diff_cols = []
            for col in spark_df.columns:
                if not values_equal(spark_df[[col]], duck_df[[col]]):
                    diff_cols.append(col)
            print(f"FAIL {name}: value mismatch in cols {diff_cols}")
            for col in diff_cols[:3]:
                mism = [(i, spark_df[col][i], duck_df[col][i])
                        for i in range(len(spark_df))
                        if (pd.isna(spark_df[col][i]) != pd.isna(duck_df[col][i]))
                        or (not pd.isna(spark_df[col][i]) and spark_df[col][i] != duck_df[col][i])][:5]
                print(f"    {col}: {mism}")
            n_fail += 1; fails.append(name); continue
        dtypes = dict(zip(spark_df.columns, spark_df.dtypes)), dict(zip(duck_df.columns, duck_df.dtypes))
        dtype_note = "" if str(dtypes[0]) == str(dtypes[1]) else \
            " [dtype diff: " + ", ".join(f"{c}:{dtypes[0][c]}|{dtypes[1][c]}"
                for c in spark_df.columns if str(dtypes[0][c]) != str(dtypes[1][c])) + "]"
        print(f"PASS {name} ({len(spark_df)} rows){dtype_note}")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed" + (f": {fails}" if fails else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
