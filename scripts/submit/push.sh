#!/usr/bin/env bash
# Build + push the submission image to the competition registry
# (reference submit/push.sh).  Run from a directory holding result.zip —
# produce it with:
#   python -m item_alignment_tpu.cli ensemble ... && \
#   python -c 'from item_alignment_tpu.aggregate.submit import package_submission; \
#              package_submission("output/ensemble/deepAI_result.jsonl", "result.zip")'
# Requires network access to the Tianchi registry (not available offline).
set -euo pipefail

TAG=${TAG:-ensemble-threshold_0.0}
REPO=registry.cn-shanghai.aliyuncs.com/ccks2022_task9_subtask2/submit

docker build -f "$(dirname "$0")/Dockerfile" -t "$REPO:$TAG" .
docker push "$REPO:$TAG"
