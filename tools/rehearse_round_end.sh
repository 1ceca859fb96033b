#!/usr/bin/env bash
# Round-end rehearsal (VERDICT r13 next #7): run the driver's FULL
# round-end sequence — default Bench at sf0.1, then Verify at sf0.01,
# then the DuckDB oracle compare — while a synthetic CPU hog contends
# for the whole run, and prove the TOTAL wall fits the driver's
# ~3600 s budget with all three artifacts non-empty. This is the
# end-to-end version of the r13 bench-only chaos test, and the exact
# scenario that zeroed rounds 12 and 13.
#
# Usage: tools/rehearse_round_end.sh [hog_threads] [out_json]
# Test tooling only — the engine itself is pure Scala/Spark.
set -u
HOG=${1:-24}
OUT=${2:-bench_rehearsal_round_end.json}
cd "$(dirname "$0")/.."
T0=$(date +%s)
LOAD0=$(cut -d' ' -f1 /proc/loadavg)

# --- synthetic contention: HOG busy-spin shells at default priority,
# alive for the entire sequence, killed on exit.
PIDS=()
for _ in $(seq "$HOG"); do ( while :; do :; done ) & PIDS+=($!); done
trap 'kill "${PIDS[@]}" 2>/dev/null' EXIT

# --- phase 1: the driver's bench gate (default config, sf0.1), under
# the same `timeout -s TERM 3600` wrapper the driver uses.
BSTART=$(date +%s)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 timeout -s TERM 3600 \
  sbt -batch "runMain graft.Bench" > /tmp/rehearsal_bench.out 2>&1
BRC=$?
BEND=$(date +%s)
LOADB=$(cut -d' ' -f1 /proc/loadavg)

# --- phase 2: the driver's correctness gate, step 1 — Verify dump.
VOUT=/tmp/verify_rehearsal
rm -rf "$VOUT"
VSTART=$(date +%s)
SPARK_GRAFT_VERIFY_PAR=6 timeout -s TERM 3000 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $VOUT" \
  > /tmp/rehearsal_verify.out 2>&1
VRC=$?
VEND=$(date +%s)

# --- phase 3: correctness gate, step 2 — DuckDB oracle compare.
python3 tools/check_oracle.py /root/testdata/sf0.01 "$VOUT" \
  > /tmp/rehearsal_oracle.out 2>&1
ORC=$?
OEND=$(date +%s)
LOAD1=$(cut -d' ' -f1 /proc/loadavg)

# --- assemble the artifact
python3 - "$OUT" <<PYEOF
import json, re, sys, pathlib
out = sys.argv[1]
bench_line = None
for ln in open('/tmp/rehearsal_bench.out', errors='replace'):
    if '"metric":"summary"' in ln:
        bench_line = ln.strip()
try:
    bench = json.loads(bench_line) if bench_line else None
except Exception:
    bench = None
vdirs = [p.name for p in pathlib.Path('$VOUT').iterdir() if p.is_dir()] \
    if pathlib.Path('$VOUT').is_dir() else []
otail = open('/tmp/rehearsal_oracle.out', errors='replace').read()
m = re.search(r'(\d+) ok, (\d+) failed of (\d+) oracled', otail)
n_rows_only = len(re.findall(r'^ROWS ', otail, re.M))
art = {
  'metric': 'rehearsal_round_end',
  'hog_threads': $HOG,
  'loadavg': {'start': $LOAD0, 'after_bench': $LOADB, 'end': $LOAD1},
  'phases': {
    'bench_sf0.1':   {'rc': $BRC, 'wall_sec': $BEND - $BSTART,
                      'summary_parsed': bench is not None,
                      'n_queries': bench and bench.get('n_queries'),
                      'n_failed': bench and bench.get('n_failed'),
                      'shed_phases': bench and bench.get('shed_phases'),
                      'headline': bench and bench.get('headline'),
                      'wall_internal_sec': bench and bench.get('wall_sec')},
    'verify_sf0.01': {'rc': $VRC, 'wall_sec': $VEND - $VSTART,
                      'n_query_dirs': len(vdirs),
                      'oracle_sql_json': pathlib.Path('$VOUT/oracle_sql.json').exists()},
    'oracle_compare': {'rc': $ORC, 'wall_sec': $OEND - $VEND,
                       'n_ok': m and int(m.group(1)),
                       'n_failed': m and int(m.group(2)),
                       'n_oracled': m and int(m.group(3)),
                       'n_rows_only': n_rows_only},
  },
  'total_wall_sec': $OEND - $T0,
  'fits_3600': ($OEND - $T0) < 3600,
  'all_artifacts_non_empty': bool(bench) and len(vdirs) > 0
      and bool(m) and int(m.group(1)) > 0,
}
json.dump(art, open(out, 'w'), indent=1)
print(json.dumps(art, indent=1))
PYEOF
