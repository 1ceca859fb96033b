#!/usr/bin/env python3
"""Times oracle SQLs in DuckDB — BASELINE.md's "relational queries < 2x
DuckDB" target, unmeasured through round 2.

Usage: time_duckdb.py <sfDir> <oracle_sql.json> [namePrefix ...]

Registers the parquet tables in <sfDir> by bare name, runs each SQL whose
name starts with one of the prefixes (default: all), best-of-3 wall time
per query (single run when the first run is slow), prints ONE JSON line
{"name": seconds, ...} on stdout. -1.0 = query errored or exceeded the
per-query budget (TIMEOUT_S, interrupt-enforced so one pathological plan
cannot wedge the whole bench — a window-heavy SQL did exactly that at
sf0.1). -2.0 = never attempted because the CUMULATIVE sweep budget
(TOTAL_BUDGET_S) was already spent — distinct from a real timeout so
artifact readers can tell budget cuts from genuinely slow queries
(ADVICE r13 #4); consumers treat any value <= 0 as "not compared".

This is benchmark tooling only (invoked by graft.Bench as a subprocess
when available) — the engine itself is pure Scala/Spark.
"""
import json
import os
import sys
import threading
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# per-query hard budget; callers measuring scaled replicas raise it via
# env (a 10x corpus legitimately needs more than the sf0.1 default, and a
# -1 there would silently drop the query from the comparison)
TIMEOUT_S = float(os.environ.get("GRAFT_DUCK_TIMEOUT_S", "30"))
# CUMULATIVE sweep budget: on a steal-contended box every query of a
# sweep can individually hit TIMEOUT_S (the r12 driver run burned
# 22 x 120 s that way). Once total wall crosses this, the remaining
# queries stamp -1.0 (the caller's duck_timed_out marker) immediately.
# 0 / unset = unlimited.
TOTAL_BUDGET_S = float(os.environ.get("GRAFT_DUCK_TOTAL_BUDGET_S", "0"))
REPEAT_UNDER_S = 2.0  # best-of-3 only for queries faster than this


def timed_run(con, sql, budget):
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    t0 = time.perf_counter()
    try:
        con.execute(sql).fetchall()
        return time.perf_counter() - t0
    except Exception:
        return None
    finally:
        timer.cancel()


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    prefixes = tuple(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written multi-file table (scaled replicas)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(oracle_path).read_text())
    out = {}
    sweep_t0 = time.perf_counter()
    for name, sql in sorted(oracle.items()):
        if prefixes and not name.startswith(prefixes):
            continue
        if TOTAL_BUDGET_S > 0 and time.perf_counter() - sweep_t0 > TOTAL_BUDGET_S:
            out[name] = -2.0  # cumulative budget spent: stamp, don't burn
            continue
        first = timed_run(con, sql, TIMEOUT_S)
        if first is None:
            out[name] = -1.0
            continue
        best = first
        if first < REPEAT_UNDER_S:
            for _ in range(2):
                t = timed_run(con, sql, TIMEOUT_S)
                if t is not None:
                    best = min(best, t)
        out[name] = round(best, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
