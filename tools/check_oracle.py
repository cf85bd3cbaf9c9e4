#!/usr/bin/env python3
"""Dev-only pre-validation of the driver's DuckDB-oracle compare.

FAITHFUL to the driver's canonicalization (this matters — round 1's replica
read the Spark result parquet back through DuckDB, which normalized DECIMAL
to float64 on both sides and hid 11 real hash-fails):

  * Spark side:  pyarrow.parquet -> pandas  (DECIMAL becomes `object` of
    decimal.Decimal, keeping trailing zeros; arrays become np.ndarray, which
    CRASHES the row sort exactly like the driver does)
  * Oracle side: duckdb .df()    -> pandas  (DECIMAL becomes float64)
  * compare: sort columns by name, sort rows (pandas sort_values over all
    columns), str() every value, exact match.

Usage: python3 tools/check_oracle.py <sf_dir> <out_dir> [query ...]
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame):
    """Column-sort, row-sort, render rows — the driver's comparison form.

    Rendering goes through pandas' column-wise CSV formatter (NOT per-value
    str()): this is what makes a duckdb datetime64 DATE ('1995-01-31
    00:00:00' under str()) compare equal to a pyarrow datetime.date
    ('1995-01-31') — pandas renders an all-midnight datetime64 column
    date-only — while still exposing Decimal('254462.00') vs float 254462.0
    mismatches. Round 1's q_date_arith (driver-green) plus the 11
    decimal hash-fails pin down exactly this behavior.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        # driver-style lexicographic row sort over all columns; raises
        # TypeError on array-typed (ndarray) cells, same as the driver
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    rows = df.to_csv(index=False, header=False, lineterminator="\n").splitlines()
    return list(df.columns), rows


def spark_frame(out_dir: str, name: str):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no result parquet under {out_dir}/{name}")
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    return canon(df)


def oracle_frame(con, sql: str):
    return canon(con.execute(sql).df())


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # the sf1 gate fans out one subprocess per query — cap each replica's
    # DuckDB thread pool so J parallel oracles don't oversubscribe the host
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    # sf1-scale replays of the iterative-CTE oracles (LPA/Louvain, the
    # cluster families) can exceed physical RAM when several run at once:
    # bound the allocator and give DuckDB a spill directory so the replay
    # completes slower instead of being OOM-killed
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
        # per-PID spill dir: concurrent gate subprocesses sharing one
        # temp_directory collide on temp block names / cleanup (observed
        # as "Cannot open file .../duckdb_temp_block-..." in the first
        # full sf1 gate run) — isolate each replica's spill space
        con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in TABLES:
        # a table may be a single file (driver testdata) or a directory of
        # part files (gen_scale.py's multi-file scale-up corpora)
        path = f"{sf_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            gcols, got = spark_frame(out_dir, name)
            ecols, exp = oracle_frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(gcols) != list(ecols):
            print(f"FAIL {name}: columns spark={list(gcols)} oracle={list(ecols)}")
            n_fail += 1
        elif got != exp:
            exp_set, got_set = set(exp), set(got)
            diff_g = [r for r in got if r not in exp_set][:3]
            diff_e = [r for r in exp if r not in got_set][:3]
            ncell = sum(1 for a, b in zip(got, exp) if a != b)
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)} "
                  f"(~{ncell} differing rows)")
            print(f"  spark-only: {diff_g}")
            print(f"  oracle-only: {diff_e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
