#!/usr/bin/env python3
"""Execute a ChunkedOraclePlan JSON in DuckDB and compare the final
result against an engine output parquet — the big-SF oracle pin that the
monolithic SQL can't reach without spilling past the box's disk.

Usage:
    python3 tools/chunked_oracle.py <sfDir> <engineOutParquetDir> <plan.json> \
        [--memory-limit 48GB] [--temp-dir /tmp/duckoracle]

sfDir provides the `documents` view the final SQL references; the plan's
COPY steps carry their own absolute paths. Prints per-step timings and a
terminal MATCH/MISMATCH verdict (rows + exact values, columns sorted by
name — the tools/check.py comparison contract).
"""
import sys, json, glob, os, time
import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(argv):
    sf_dir, engine_dir, plan_path = argv[1], argv[2], argv[3]
    mem = "48GB"
    tmp = "/tmp/duckoracle"
    if "--memory-limit" in argv:
        mem = argv[argv.index("--memory-limit") + 1]
    if "--temp-dir" in argv:
        tmp = argv[argv.index("--temp-dir") + 1]
    os.makedirs(tmp, exist_ok=True)
    plan = json.load(open(plan_path))
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmp}'")
    p = f"{sf_dir}/documents.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")
    for i, sql in enumerate(plan["steps"]):
        t0 = time.time()
        con.execute(sql)
        head = sql.replace("\n", " ")[:80]
        print(f"[chunked_oracle] step {i + 1}/{len(plan['steps'])} "
              f"{time.time() - t0:8.1f}s  {head}")
    t0 = time.time()
    duck_df = norm(con.execute(plan["final"]).fetchdf())
    print(f"[chunked_oracle] final roster {time.time() - t0:8.1f}s "
          f"rows={len(duck_df)}")
    files = sorted(glob.glob(f"{engine_dir}/*.parquet"))
    if not files:
        print(f"[chunked_oracle] MISMATCH: no engine output in {engine_dir}")
        return 1
    spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"[chunked_oracle] MISMATCH: columns {list(spark_df.columns)} "
              f"vs {list(duck_df.columns)}")
        return 1
    if len(spark_df) != len(duck_df):
        print(f"[chunked_oracle] MISMATCH: rows engine={len(spark_df)} "
              f"oracle={len(duck_df)}")
        return 1
    eq = spark_df.reset_index(drop=True).equals(duck_df.reset_index(drop=True))
    if not eq:
        diff = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
        n_bad = int(diff.any(axis=1).sum())
        print(f"[chunked_oracle] MISMATCH: {n_bad} differing rows of {len(spark_df)}")
        bad = spark_df[diff.any(axis=1)].head(5)
        print(bad)
        return 1
    print(f"[chunked_oracle] MATCH: {len(spark_df)} rows, exact values")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
