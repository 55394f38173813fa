#!/usr/bin/env bash
# Round-5 chip queue, ordered by VERDICT r4 "Next round" #3/#4/#6:
#   (1) GCN full-scale train step FIRST (deadline-clipped in r3 and r4 —
#       a queue-ordering bug, per the verdict), 256k then 128k edge chunks,
#   (2) on-chip Pallas kernel suite with an explicit 15-passed assert
#       (an rc=0 alone can mask collect-and-skip),
#   (3) int8 cross-encoder post shared-QKV prequant (818d971, unmeasured),
#   (4) KGE marginal eval rate (replaces the extrapolated full-eval figure),
#   (5) remat_policy=mlp v2 A/B (dots-minus-wide; bs 64 where dots OOMs).
# Logs land in benchlogs/r5/ so every claim is committable (VERDICT #2).
#
# run(): a step is skipped as CACHED only when its .ok sentinel exists;
# the sentinel is written only on rc=0 AND a final JSON line without an
# "error" key (ADVICE r4: the r4j grep-for-'{' cache treated failed runs
# as complete forever).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${OUT:-benchlogs/r5}
mkdir -p "$OUT"
CACHE=${JAX_COMPILATION_CACHE_DIR:-/root/rehearsal/xla_cache}

echo "=== [r5] start @ $(date +%s) ===" | tee -a "$OUT/queue.log"

ok_json() {  # last '{'-line parses as JSON and has no "error" key
  python - "$1" <<'EOF'
import json, sys
line = None
for l in open(sys.argv[1], errors="replace"):
    if l.startswith("{"):
        line = l
try:
    row = json.loads(line)
except Exception:
    sys.exit(1)
sys.exit(1 if (not isinstance(row, dict) or "error" in row) else 0)
EOF
}

run() {
  local name=$1 t=$2 check=$3; shift 3
  if [ -e "$OUT/$name.ok" ]; then
    echo "=== [r5] $name CACHED (.ok) ===" | tee -a "$OUT/queue.log"
    return
  fi
  echo "=== [r5] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  local verdict=FAIL
  if [ "$rc" = 0 ]; then
    case "$check" in
      json) ok_json "$OUT/$name.log" && verdict=OK ;;
      15passed) grep -q "15 passed" "$OUT/$name.log" && verdict=OK ;;
      none) verdict=OK ;;
    esac
  fi
  [ "$verdict" = OK ] && touch "$OUT/$name.ok"
  echo "=== [r5] $name rc=$rc $verdict @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# (1) GCN reference scale: 230k nodes / 2M edges, scan_layers
run gcn_scan_256k 3600 json python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 262144 --compilation_cache_dir "$CACHE"
run gcn_scan_128k 3600 json python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 131072 --compilation_cache_dir "$CACHE"

# (2) Pallas kernel suite on the chip — gate on the literal pass count
run kernel_suite 1800 15passed env IA_TPU_TESTS=1 \
  python -m pytest --no-header -p no:cacheprovider -q \
  tests/test_pallas_kernel_tpu.py

# (3) int8 cross-encoder after the shared-QKV prequant
run xenc_int8 1800 json env JAX_COMPILATION_CACHE_DIR="$CACHE" \
  python benchmarks/bench_cross_encoder.py --quant int8
# (4) KGE marginal eval rate (measured, not extrapolated)
run kge_eval_marginal 2400 json env JAX_COMPILATION_CACHE_DIR="$CACHE" \
  python benchmarks/bench_kge.py --epochs 1 --eval_triples 2048 \
  --eval_marginal

# (5) remat mlp-v2 A/B: bs 64 (every r4 policy OOMed there) + bs 48
run train_bs64_mlp 2400 json env JAX_COMPILATION_CACHE_DIR="$CACHE" \
  python benchmarks/bench_train.py --batch_size 64 --remat \
  --remat_policy mlp --opt_state_dtype bfloat16
run train_bs48_mlp 2400 json env JAX_COMPILATION_CACHE_DIR="$CACHE" \
  python benchmarks/bench_train.py --batch_size 48 --remat \
  --remat_policy mlp --opt_state_dtype bfloat16

echo "=== [r5] complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
