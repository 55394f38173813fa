#!/usr/bin/env bash
# Round-5 one-pass composed rehearsal (VERDICT r4 "Next round" #1): ALL
# train.sh steps 0..9 + ALL predict.sh members p0..p6 + the category-aware
# ensemble + scorer-validated result.zip, in ONE uninterrupted pass with
# the legacy-BERT leg actually executing (the only member never proven on
# hardware through round 4).
#
# Runs from a SNAPSHOT CLONE of the repo at HEAD (round-4 lesson: a 5h+
# pipeline must not pick up a mid-edit tree), text corpus at reference
# shape (120k items / 65k train pairs / 258k KG entities), image slice at
# 700 train pairs (this host has ONE cpu core, so the host-bound 800px
# shard writing is sized to fit the session; the image member's full-shape
# wall-clock was measured in round 3 at 1,356 pairs — COVERAGE.md).
# Evidence lands in benchlogs/r5/rehearsal/ via scripts/round5_collect.sh.
set -uo pipefail
OUT=${OUT:-/root/bench_r5_rehearsal}
SNAP=/root/rehearsal_repo
DATA_DIR=${DATA_DIR:-/root/rehearsal}
mkdir -p "$OUT"

rm -rf "$SNAP"
git clone -q /root/repo "$SNAP"
echo "snapshot at $(git -C "$SNAP" rev-parse --short HEAD) @ $(date +%s)" \
  | tee -a "$OUT/queue.log"

echo "=== [r5r] one-pass rehearsal @ $(date +%s) ===" | tee -a "$OUT/queue.log"
timeout "${REHEARSAL_BUDGET:-21600}" env -u OUT \
  START_AT="${START_AT:-}" PREDICT_START_AT="${PREDICT_START_AT:-}" \
  DATA_DIR="$DATA_DIR" \
  CORPUS_FLAGS="--n_image_pairs 700" \
  EPOCHS=1 KGE_EPOCHS=50 BERT_EPOCHS=1 \
  PYTHONPATH="$SNAP:${PYTHONPATH:-}" \
  JAX_COMPILATION_CACHE_DIR="$DATA_DIR/xla_cache" \
  bash "$SNAP/scripts/rehearsal.sh" > "$OUT/rehearsal.log" 2>&1
rc=$?
echo "=== [r5r] rehearsal rc=$rc @ $(date +%s) ===" | tee -a "$OUT/queue.log"
exit $rc
