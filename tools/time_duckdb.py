#!/usr/bin/env python3
"""Times oracle SQLs in DuckDB — BASELINE.md's "relational queries < 2x
DuckDB" target, unmeasured through round 2.

Usage: time_duckdb.py <sfDir> <oracle_sql.json> [namePrefix ...]

Registers the parquet tables in <sfDir> by bare name, runs each SQL whose
name starts with one of the prefixes (default: all), best-of-3 wall time
per query, prints ONE JSON line {"name": seconds, ...} on stdout
(-1.0 = query errored).

This is benchmark tooling only (invoked by graft.Bench as a subprocess
when available) — the engine itself is pure Scala/Spark.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    prefixes = tuple(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(oracle_path).read_text())
    out = {}
    for name, sql in sorted(oracle.items()):
        if prefixes and not name.startswith(prefixes):
            continue
        try:
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 4)
        except Exception:
            out[name] = -1.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
