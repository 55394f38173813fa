"""Observability: CSV writer, scalar logger, step timer, time format."""

import csv
import json
import time

from item_alignment_tpu.engine.observability import (
    EvalWriter,
    ScalarLogger,
    StepTimer,
    format_time,
    profile_trace,
)


def test_eval_writer_appends_rows(tmp_path):
    path = str(tmp_path / "results.csv")
    w = EvalWriter(path, ["epoch", "f1", "threshold"])
    w.write(epoch=0, f1=0.8, threshold=0.4)
    w.write(epoch=1, f1=0.85)
    w.close()
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 2
    assert rows[0]["f1"] == "0.8"
    assert rows[1]["threshold"] == ""
    # re-open appends without re-writing the header
    w2 = EvalWriter(path, ["epoch", "f1", "threshold"])
    w2.write(epoch=2, f1=0.9)
    w2.close()
    assert len(list(csv.DictReader(open(path)))) == 3


def test_scalar_logger_jsonl(tmp_path):
    path = str(tmp_path / "scalars.jsonl")
    s = ScalarLogger(path)
    s.add_scalar("train/loss", 1.5, 10)
    s.add_scalar("eval/f1", 0.8, 10)
    s.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["tag"] == "train/loss" and rows[0]["value"] == 1.5
    assert rows[1]["step"] == 10


def test_step_timer():
    t = StepTimer(window=4)
    for _ in range(3):
        t.tick()
        time.sleep(0.01)
    assert t.ms_per_step > 5
    assert t.steps_per_sec > 0


def test_format_time():
    assert format_time(3661) == "1:01:01"
    assert format_time(59) == "0:00:59"


def test_profile_trace_noop():
    with profile_trace(None):
        pass  # no-op path must not require jax
