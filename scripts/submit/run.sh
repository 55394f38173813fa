#!/bin/sh
# Entry point executed inside the Tianchi submission container.  The
# organizer's harness unzips result.zip itself and invokes the scorer
# against deepAI_result.jsonl; nothing to do at container start (the
# reference's submit/run.sh is likewise empty).
exit 0
