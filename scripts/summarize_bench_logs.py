#!/usr/bin/env python
"""Collect the final JSON line from each bench-queue log into one report.

Every benchmark in `benchmarks/` (and `bench.py`) prints machine-readable
JSON; the round queues (`scripts/round3*_queue.sh`) redirect each run to
`$OUT/<name>.log`.  This digests a results directory into a name->JSON
table for COVERAGE.md / README updates:

    python scripts/summarize_bench_logs.py /root/bench_r3
"""

import glob
import json
import os
import sys


def last_json_line(path):
    out = None
    for ln in open(path, errors="replace"):
        ln = ln.strip()
        if ln.startswith("{") and ln.endswith("}"):
            try:
                out = json.loads(ln)
            except json.JSONDecodeError:
                pass
    return out


def main(out_dir):
    rows = {}
    for path in sorted(glob.glob(os.path.join(out_dir, "*.log"))):
        name = os.path.basename(path)[:-4]
        if name in ("queue", "finish", "watcher") or name.endswith("_driver"):
            continue
        d = last_json_line(path)
        rows[name] = d
    for name, d in rows.items():
        print(f"{name}: {json.dumps(d) if d else '(no JSON line)'}")
    missing = [n for n, d in rows.items() if d is None]
    if missing:
        print(f"\nno JSON in: {', '.join(missing)}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/bench_r3")
