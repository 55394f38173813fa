"""Summarize a dress-rehearsal run (scripts/rehearsal.sh) into the measured
per-step wall-clock table for COVERAGE.md.

Reads every train/predict log part under the rehearsal DATA_DIR (the run may
have been resumed with train.sh START_AT=...), keeps the LAST completed
instance of each step, and prints a markdown table plus one JSON line.

Usage: python scripts/summarize_rehearsal.py /root/rehearsal
"""

import glob
import json
import os
import re
import sys


def parse_marks(text):
    """[(step_name, epoch_seconds)] from '=== [train.sh] step N @ T ===' and
    rehearsal begin/end marks (which bound the last step of each phase)."""
    pat = re.compile(
        r"=== \[(?:train\.sh|predict\.sh|rehearsal)\] (?:step )?"
        r"(\S+(?: \S+)*?) @ (\d+) ===")
    return [(m.group(1), int(m.group(2))) for m in pat.finditer(text)]


def main(data_dir):
    logs = sorted(glob.glob(os.path.join(data_dir, "train_log*.txt"))) + \
        sorted(glob.glob(os.path.join(data_dir, "predict_log*.txt"))) + \
        sorted(glob.glob(os.path.join(data_dir, "rehearsal_main*.log")))
    durations = {}   # step -> seconds (last completed instance wins)
    order = []
    for path in logs:
        text = open(path, errors="replace").read()
        marks = parse_marks(text)
        for (name, t0), (_, t1) in zip(marks, marks[1:]):
            if name.startswith(("train.sh", "predict.sh")):
                continue
            # a skipped (START_AT-gated) instance prints the skip note
            # right after its mark; don't let its ~0s overwrite a real run
            seg = text[text.index(f"step {name} @ {t0}"):]
            first_line_after = seg.splitlines()[1] if len(
                seg.splitlines()) > 1 else ""
            if "(skipped" in first_line_after:
                continue
            if name not in order:
                order.append(name)
            durations[name] = t1 - t0
    # predict.sh prints no per-step marks; take the phase bounds from the
    # rehearsal driver log
    for path in sorted(glob.glob(os.path.join(data_dir, "rehearsal_main*.log"))):
        text = open(path, errors="replace").read()
        b = re.search(r"=== \[rehearsal\] predict\.sh begin @ (\d+)", text)
        e = re.search(r"=== \[rehearsal\] predict\.sh end rc=0 @ (\d+)", text)
        if b and e:
            durations["predict.sh (7 members + ensemble + result.zip)"] = \
                int(e.group(1)) - int(b.group(1))

    def key(s):
        m = re.match(r"(\d+)([ab]?)", s)
        return (0, int(m.group(1)), m.group(2)) if m else (1, 0, s)

    rows = [{"step": s, "seconds": durations[s]}
            for s in sorted(durations, key=key) if s != "done"]
    total = sum(r["seconds"] for r in rows)
    print("| pipeline step | measured wall-clock |")
    print("|---|---|")
    for r in rows:
        m, s = divmod(r["seconds"], 60)
        print(f"| {r['step']} | {m}m{s:02d}s |")
    print(f"| **total** | **{total // 3600}h{(total % 3600) // 60:02d}m** |")
    print(json.dumps({"per_step_seconds": rows, "total_seconds": total}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/rehearsal")
