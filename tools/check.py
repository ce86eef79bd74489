#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - registers the sf parquet tables as DuckDB views
  - executes each oracle_sql.json entry in DuckDB
  - reads the Spark-written parquet result
  - compares (columns sorted by name, values stringified) both as-ordered
    and as sorted multisets.

Both sides are fetched through the DuckDB -> pandas dataframe path (the
same rendering pipeline the driver's canonicalizer uses) rather than raw
fetchall()+str(). This is load-bearing: DuckDB types like HUGEINT (the
result of sum(INTEGER)) convert to float64 in a dataframe and render
"14.0", while a Spark BIGINT renders "14" — a real driver hash mismatch
that Python str() over fetchall() values cannot see (the exact r08
q42 failure class). str() canonicalization is strictly weaker than the
gate this mirrors; don't reintroduce it.
"""
import json
import math
import os
import sys

import duckdb
import numpy as np


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, np.ndarray):
        return "[" + ", ".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(canon(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, float):  # covers np.float64 (subclass of float)
        if math.isnan(v):
            return "NaN"
        # render like a fixed decimal; values are pre-rounded in-query.
        # repr() keeps the int/float distinction: float64 14.0 -> "14.0"
        # vs int64 14 -> "14" — the dtype divergence the driver hashes.
        return repr(v)
    try:
        if v != v:  # pandas NaT and friends
            return "NaN"
    except Exception:
        pass
    return str(v)


def frame(con, sql):
    """Fetch through the dataframe path (driver-equivalent rendering)."""
    df = con.execute(sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(canon(v) for v in r)
            for r in df.itertuples(index=False, name=None)]
    return list(cols), rows


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
