#!/usr/bin/env python3
"""DuckDB side of the paired benchmark (BASELINE.md §c).

Runs every oracle SQL against read_parquet views of the given scale-factor
directory, `iters` timed runs per query after one warm-up pass, and prints
ONE JSON line: {"total": sec, "queries": {name: sec, ...}, "n": count}.

Invoked by graft.Bench (when python3+duckdb are present) so BENCH_r{N}.json
carries its own same-machine-same-minute denominator — absolute totals on
this container swing 1.6x with neighbor load, so only a simultaneous pair
is meaningful. Also usable standalone:

  python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [iters]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    with open(oracle_path) as f:
        oracles = json.load(f)

    # warm-up pass: OS page cache + duckdb internal state
    for sql in oracles.values():
        try:
            con.execute(sql).fetchall()
        except Exception:
            pass

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
    main()
