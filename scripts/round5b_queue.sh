#!/usr/bin/env bash
# Round-5 post-rehearsal perf tail: runs ONLY after the one-pass rehearsal
# releases the chip.  (1) bench.py sanity vs the blessed baselines, then
# (2) encode-batch A/B on the mining path's dominant stage — the 255-token
# item tower runs at bs 64 (inherited from the 510-token cross-encoder's
# measured sweet spot) but shorter rows may sit better on the MXU at
# 128/256; encode is ~99.7% of the mining wall-clock (score stage is
# 17.9M pairs/s), so an encode win moves the headline almost 1:1.
# Same sentinel discipline as round5_queue.sh.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${OUT:-benchlogs/r5}
mkdir -p "$OUT"

echo "=== [r5b] start @ $(date +%s) ===" | tee -a "$OUT/queue.log"

ok_json() {
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
  local name=$1 t=$2; shift 2
  if [ -e "$OUT/$name.ok" ]; then
    echo "=== [r5b] $name CACHED (.ok) ===" | tee -a "$OUT/queue.log"
    return
  fi
  echo "=== [r5b] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  local verdict=FAIL
  [ "$rc" = 0 ] && ok_json "$OUT/$name.log" && verdict=OK
  [ "$verdict" = OK ] && touch "$OUT/$name.ok"
  echo "=== [r5b] $name rc=$rc $verdict @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

run bench_sanity 1800 python bench.py
run mine_b64  1200 python benchmarks/bench_two_tower.py --batch_size 64
run mine_b128 1200 python benchmarks/bench_two_tower.py --batch_size 128
run mine_b256 1200 python benchmarks/bench_two_tower.py --batch_size 256

echo "=== [r5b] done @ $(date +%s) ===" | tee -a "$OUT/queue.log"
