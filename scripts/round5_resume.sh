#!/usr/bin/env bash
# Resume the round-5 one-pass rehearsal after a tunnel stall killed it at
# step 7-nfnet (steps 0..6b completed; their artifacts + the persistent
# XLA cache live in /root/rehearsal).  Probes the TPU tunnel until a real
# device op completes, then relaunches round5_rehearsal.sh with
# START_AT=7 so train.sh steps 7..9 and the full predict.sh run against
# the existing corpus and member checkpoints.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/root/bench_r5_rehearsal/queue.log}

echo "[resume] probe start @ $(date +%s)" | tee -a "$LOG"
n=0
while true; do
  n=$((n + 1))
  if timeout 90 python -c "
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.arange(8.0) * 2)) == 56.0
print('tunnel ok, devices:', jax.devices())
" >> "$LOG" 2>&1; then
    echo "[resume] tunnel healthy after $n probes @ $(date +%s)" \
      | tee -a "$LOG"
    break
  fi
  echo "[resume] probe $n failed @ $(date +%s)" >> "$LOG"
  sleep 100
done

START_AT="${RESUME_START_AT:-7}" bash scripts/round5_rehearsal.sh
