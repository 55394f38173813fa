#!/usr/bin/env bash
# Tunnel watchdog for the round-5 one-pass rehearsal: the remote-TPU relay
# goes down for stretches (r3: killed the rehearsal's tail; r5: wedged a
# trivial jnp.sum for >2 min with zero other clients).  Probe until a tiny
# device op completes, then relaunch the FULL one-pass rehearsal against
# the existing corpus + compile cache.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA_DIR=${DATA_DIR:-/root/rehearsal}
LOG=${LOG:-/root/rehearsal_watchdog.log}

echo "[watchdog] start @ $(date +%s)" | tee -a "$LOG"
n=0
while true; do
  n=$((n + 1))
  if timeout 90 python -c "
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.arange(8.0) * 2)) == 56.0
print('tunnel ok, devices:', jax.devices())
" >> "$LOG" 2>&1; then
    echo "[watchdog] tunnel healthy after $n probes @ $(date +%s)" \
      | tee -a "$LOG"
    break
  fi
  echo "[watchdog] probe $n failed @ $(date +%s)" >> "$LOG"
  sleep 100
done

# fresh one-pass: stash any partial outputs from the aborted attempt
if [ -d "$DATA_DIR/output" ]; then
  mv "$DATA_DIR/output" "$DATA_DIR/output_aborted_$(date +%s)"
fi
echo "[watchdog] launching rehearsal @ $(date +%s)" | tee -a "$LOG"
DATA_DIR="$DATA_DIR" EPOCHS=1 KGE_EPOCHS=8 BERT_EPOCHS=1 \
  bash scripts/rehearsal.sh
rc=$?
echo "[watchdog] rehearsal rc=$rc @ $(date +%s)" | tee -a "$LOG"
exit $rc
