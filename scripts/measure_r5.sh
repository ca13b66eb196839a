#!/bin/bash
# Round-5 measurement battery — run once the TPU tunnel is reachable.
# One pass captures everything the r5 docs/verdict cite:
#   1. bench.py default invocation — the FULL driver artifact line (B=1
#      RTF + spread, B=8 wall/RTF-per-chip, streaming TTFA p50, daemon
#      /synthesize p50 + /stream TTFA p50 via the bounded subprocess leg)
#   2. the B=8 leg classification with analytic floors (§11 ninth
#      finding: every non-kernel leg floored or closed)
#   3. the daemon latency attribution (engine vs handler vs socket,
#      JSON-vs-binary body A/B — §13: the device fetch is the wall)
#   4. the full daemon battery (stream capacity + load A/B as in r4)
# Logs land in .cache/r5_bench/ (one file per leg, JSON line at the end).
set -u
cd "$(dirname "$0")/.."
OUT=.cache/r5_bench
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  stdbuf -oL -eL timeout 3600 "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc; tail:"
  tail -3 "$OUT/$name.log"
}

run bench_full        python bench.py
run b8_legs           python scripts/measure_b8_legs.py --detail
run daemon_attrib     python scripts/measure_daemon_attrib.py --reps 15
run daemon            python scripts/bench_daemon.py --reps 15
run daemon_stream4    python scripts/bench_daemon.py --reps 6 --no-batch --stream-load 4
run daemon_load_off   python scripts/bench_daemon.py --reps 6 --no-batch --load 8
echo "=== all done ($(date +%H:%M:%S)); logs in $OUT/"
