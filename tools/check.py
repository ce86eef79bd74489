#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - registers the sf parquet tables as DuckDB views
  - executes each oracle_sql.json entry in DuckDB
  - reads the Spark-written parquet result
  - compares (columns sorted by name, values stringified) both as-ordered
    and as sorted multisets.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # render like a fixed decimal; values are pre-rounded in-query
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [
        tuple(canon(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            scols, srows = frame(
                con, f"SELECT * FROM read_parquet('{spark_glob}')")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: no oracle, rows={len(srows)}")
            continue
        try:
            ocols, orows = frame(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        ordered = srows == orows
        sorted_eq = sorted(srows) == sorted(orows)
        if ordered:
            print(f"PASS {name}: rows={len(srows)}")
            n_pass += 1
        elif sorted_eq:
            print(f"WARN {name}: matches only after row sort (check ORDER BY)")
            n_pass += 1
        else:
            n_fail += 1
            sset, oset = set(srows), set(orows)
            only_s = list(sset - oset)[:3]
            only_o = list(oset - sset)[:3]
            print(f"FAIL {name}: spark_rows={len(srows)} oracle_rows={len(orows)}")
            if only_s:
                print(f"     spark-only: {only_s}")
            if only_o:
                print(f"     oracle-only: {only_o}")
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
