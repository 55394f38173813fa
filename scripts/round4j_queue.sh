#!/usr/bin/env bash
# Round-4 session-5 chip chain (fresh container: /root/bench_r4 from the
# earlier sessions is gone; benchlogs/r4 in-repo holds what was harvested).
# Runs AFTER the reduced-size dress rehearsal drains:
#   (1) headline bench.py (backfills the r4g/r4i bench_headline job and
#       exercises the perf-regression gate against BENCH_r03.json),
#   (2) GCN full-scale scan-layer sweep (VERDICT r3 #5) through the
#       persistent compile cache, 128k first (smaller compile, better odds
#       against the remote-compile relay), then 256k,
#   (3) KGE marginal eval rate (closes the ADVICE r3 estimate-vs-measured
#       note in COVERAGE.md).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${OUT:-/root/bench_r4j}
WAIT_PID=${WAIT_PID:-}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/rehearsal/xla_cache}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== [r4j] start @ $(date +%s) ===" | tee -a "$OUT/queue.log"

run() {
  # a step is CACHED only via its .ok sentinel, written only on rc=0
  # (ADVICE r4: grepping the log for '^{' treated failed runs — bench.py
  # error JSON, timeout-killed partial output — as complete forever)
  local name=$1 t=$2; shift 2
  if [ -e "$OUT/$name.ok" ]; then
    echo "=== [r4j] $name CACHED (.ok) ===" | tee -a "$OUT/queue.log"
    return
  fi
  echo "=== [r4j] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  [ "$rc" = 0 ] && ! grep -q '"error"' "$OUT/$name.log" \
    && touch "$OUT/$name.ok"
  echo "=== [r4j] $name rc=$rc @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

run bench_headline 1800 python bench.py
run gcn_scan_128k 3000 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 131072 \
  --compilation_cache_dir "$JAX_COMPILATION_CACHE_DIR"
run gcn_scan_256k 3000 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 262144 \
  --compilation_cache_dir "$JAX_COMPILATION_CACHE_DIR"
run kge_eval_marginal 1800 python benchmarks/bench_kge.py --epochs 1 \
  --eval_triples 2048 --eval_marginal
echo "=== [r4j] complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
