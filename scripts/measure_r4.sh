#!/bin/bash
# Round-4 measurement battery — run once the TPU tunnel is reachable.
# Captures everything the r4 docs/verdict need in one pass:
#   1. bench.py B=1 and B=8 (driver metric + TTFA, current default path)
#   2. the a>1 in-kernel upsample A/B (cfg.vocoder_fuse_a_upsample) at
#      B=1 and B=8 — decides the flag's default (ARCHITECTURE §11 seventh
#      finding)
#   3. the serving daemon's /synthesize p50 + /stream TTFA p50 over a live
#      socket (replaces §13's pre-PCM16 projection)
# Logs land in .cache/r4_bench/ (one file per leg, JSON line at the end).
set -u
cd "$(dirname "$0")/.."
OUT=.cache/r4_bench
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  stdbuf -oL -eL timeout 1800 "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc; tail:"
  tail -3 "$OUT/$name.log"
}

run bench_b1          python bench.py
run bench_b8          python bench.py --batch 8 --no-ttfa
run bench_b1_fuse_a   python bench.py --fuse-a --no-ttfa
run bench_b8_fuse_a   python bench.py --batch 8 --fuse-a --no-ttfa
run daemon            python scripts/bench_daemon.py --reps 15
# concurrent /stream capacity (r4: no server-side stream lock — N
# streams overlap their per-chunk tunnel RTTs instead of convoying)
run daemon_stream4    python scripts/bench_daemon.py --reps 6 --no-batch --stream-load 4
# dynamic-batching A/B under 8 concurrent clients (req/s + p50)
run daemon_load_off   python scripts/bench_daemon.py --reps 6 --no-batch --load 8
run daemon_load_on    python scripts/bench_daemon.py --reps 6 --no-batch --load 8 --batch-window-ms 10
# serving-path phase costs + fetch-bandwidth/overlap + stream dispatch-ahead
# (the session-3 investigations: §13 transfer-wall A/B, stream 888->143 ms)
run packed_phases     python scripts/measure_packed_phases.py
run fetch_overlap     python scripts/measure_fetch_overlap.py
run stream_ahead      python scripts/measure_stream_ahead.py
echo "=== all done ($(date +%H:%M:%S)); logs in $OUT/"
