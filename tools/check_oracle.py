#!/usr/bin/env python3
"""Dev-only pre-validation of the driver's DuckDB-oracle compare.

Mimics the driver: for each result parquet written by `graft.Verify` into
OUT_DIR, run the corresponding SQL from oracle_sql.json in DuckDB over the
same testdata parquet, sort columns by name, sort rows, and compare values.

Usage: python3 tools/check_oracle.py <sf_dir> <out_dir> [query ...]
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            gcols, got = frame(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            ecols, exp = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns spark={gcols} oracle={ecols}")
            n_fail += 1
        elif got != exp:
            diff_g = [r for r in got if r not in set(map(tuple, exp))][:3]
            diff_e = [r for r in exp if r not in set(map(tuple, got))][:3]
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
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
