#!/usr/bin/env python3
"""DuckDB side of the paired benchmark (BASELINE.md §c).

Two modes:

serve <sfDir> <oracle_sql.json>   (used by graft.Bench)
    Long-lived twin: creates read_parquet views, runs one untimed warm-up
    pass over every oracle, prints READY, then answers one query name per
    stdin line with "<name>,<seconds>" ("-1" on failure) until EXIT/EOF.
    This lets the Scala side interleave engines per query (S,D,S,D, ...)
    so neighbor-load drift lands on both engines symmetrically — the
    back-to-back phase design measured the same binary at 2.12x and 1.10x
    across rounds 4/5 purely from machine load.

<sfDir> <oracle_sql.json> [iters]   (standalone batch mode)
    Runs every oracle `iters` times after a warm-up pass and prints ONE
    JSON line: {"total": sec, "queries": {name: sec}, "n": count,
    "failed": [...]}.

Driver-side tooling only (python3 + duckdb are on the driver image); the
Spark library itself never depends on this.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def warm_up(con, oracles):
    # OS page cache + duckdb internal state
    for sql in oracles.values():
        try:
            con.execute(sql).fetchall()
        except Exception:
            pass


def serve(sf_dir, oracle_path):
    con = connect(sf_dir)
    with open(oracle_path) as f:
        oracles = json.load(f)
    warm_up(con, oracles)
    print("READY", flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name or name == "EXIT":
            break
        sql = oracles.get(name)
        if sql is None:
            print(f"{name},-1", flush=True)
            continue
        t0 = time.monotonic()
        try:
            con.execute(sql).fetchall()
            print(f"{name},{time.monotonic() - t0:.4f}", flush=True)
        except Exception as e:
            print(f"[bench_duckdb] {name} FAILED: {e}", file=sys.stderr)
            print(f"{name},-1", flush=True)


def batch(sf_dir, oracle_path, iters):
    con = connect(sf_dir)
    with open(oracle_path) as f:
        oracles = json.load(f)
    warm_up(con, oracles)

    times = {}
    failed = []
    for name in sorted(oracles):
        best = None
        for _ in range(iters):
            t0 = time.monotonic()
            try:
                con.execute(oracles[name]).fetchall()
            except Exception as e:
                print(f"[bench_duckdb] {name} FAILED: {e}", file=sys.stderr)
                best = -1.0
                failed.append(name)
                break
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        times[name] = round(best, 3)
    total = round(sum(v for v in times.values() if v >= 0), 3)
    # `failed` lets the Scala side drop the same queries from its numerator
    # so the ratio always compares identical query sets
    print(json.dumps({"total": total, "queries": times, "n": len(times),
                      "failed": failed}))


if __name__ == "__main__":
    if sys.argv[1] == "serve":
        serve(sys.argv[2], sys.argv[3])
    else:
        batch(sys.argv[1], sys.argv[2],
              int(sys.argv[3]) if len(sys.argv) > 3 else 2)
