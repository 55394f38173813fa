#!/usr/bin/env bash
# Collect the round-5 one-pass rehearsal evidence into the repo
# (VERDICT r4 #1/#2: every hardware claim must resolve to an in-repo log).
# Copies the orchestrator log, the train/predict logs with their per-step
# rc lines, the per-step timing json, and the artifact proofs the verdict
# names: a non-empty bert-member prediction JSONL, the ensemble row count,
# and the scorer-contract validation of result.zip.
set -uo pipefail
cd "$(dirname "$0")/.."
DATA_DIR=${DATA_DIR:-/root/rehearsal}
SRC=${SRC:-/root/bench_r5_rehearsal}
DEST=benchlogs/r5/rehearsal
mkdir -p "$DEST"

cp "$SRC/queue.log" "$DEST/orchestrator.log" 2>/dev/null || true
# the pass was interrupted once (TPU relay stall at step 7-nfnet, killed
# with the session); attempt-1 logs are preserved as *_1 so every step's
# rc line stays resolvable in-repo across the resume
cp "$SRC"/rehearsal*.log "$DEST/" 2>/dev/null || true
cp "$DATA_DIR"/train_log*.txt "$DEST/" 2>/dev/null || true
cp "$DATA_DIR"/predict_log*.txt "$DEST/" 2>/dev/null || true
cp "$DATA_DIR/rehearsal_steps.json" "$DEST/" 2>/dev/null || true

python - "$DATA_DIR" "$DEST" <<'EOF'
import glob
import json
import os
import sys
import zipfile

data_dir, dest = sys.argv[1], sys.argv[2]
out = os.path.join(data_dir, "output")
proof = {}

# per-member prediction row counts (the verdict's "non-empty bert jsonl"
# plus every other member for the 7-member ensemble claim)
members = {}
for path in sorted(glob.glob(os.path.join(out, "*", "deepAI_result_*.jsonl"))):
    member = os.path.basename(os.path.dirname(path))
    members[member] = sum(1 for _ in open(path))
proof["member_prediction_rows"] = members

ens = os.path.join(out, "ensemble", "deepAI_result.jsonl")
proof["ensemble_rows"] = (
    sum(1 for _ in open(ens)) if os.path.exists(ens) else None)

zpath = os.path.join(data_dir, "result.zip")
if os.path.exists(zpath):
    with zipfile.ZipFile(zpath) as z:
        proof["result_zip_names"] = sorted(z.namelist())

try:
    from item_alignment_tpu.aggregate.submit import validate_submission
    proof["validate_submission"] = validate_submission(ens)
except Exception as exc:  # keep the proof file writable regardless
    proof["validate_submission"] = f"error: {exc}"

with open(os.path.join(dest, "artifact_proof.json"), "w") as f:
    json.dump(proof, f, indent=1, default=str)
print(json.dumps(proof, indent=1, default=str))
EOF
