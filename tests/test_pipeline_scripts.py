"""Orchestration-surface tests: cmd_ensemble's prediction-file fallback and
train.sh's START_AT mid-pipeline resume gating.

The reference pipeline (predict.sh -> model_ensemble.py) reads one fixed
``--input_file`` name per member; members predicted at another --threshold
write differently named files, so cmd_ensemble falls back to the file named
by THAT member's own spec threshold — never an arbitrary leftover, which
could be a stale prediction from an earlier run (round-2 advisor finding on
scripts/predict.sh:60, tightened in round 3).
"""

import json
import os
import subprocess

import pytest

from item_alignment_tpu.aggregate.ensemble import write_prediction_file
from item_alignment_tpu.cli import main as cli_main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rows(probs):
    return [{"src_item_id": f"s{i}", "src_item_emb": "[0]",
             "tgt_item_id": f"t{i}", "tgt_item_emb": f"[{p}]",
             "threshold": 0.5} for i, p in enumerate(probs)]


def _member(data_dir, name, filename, probs):
    d = os.path.join(data_dir, "output", name)
    os.makedirs(d, exist_ok=True)
    write_prediction_file(_rows(probs), os.path.join(d, filename))


def _run_ensemble(data_dir, models):
    return cli_main(["ensemble", "--data_dir", str(data_dir),
                     "--ensemble_strategy", "threshold",
                     "--models", json.dumps(models)])


def test_ensemble_accepts_member_threshold_file(tmp_path, capsys):
    # textcnn predicted at --threshold 0.6: file name differs from the
    # default --input_file but matches the member's spec threshold -> used
    _member(tmp_path, "m_a", "deepAI_result_threshold=0.4.jsonl", [0.9, 0.2])
    _member(tmp_path, "m_b", "deepAI_result_threshold=0.6.jsonl", [0.8, 0.1])
    rc = _run_ensemble(tmp_path, [["m_a", 0.5, 0.9], ["m_b", 0.6, 0.7]])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pairs"] == 2
    assert os.path.exists(out["output"])


def test_ensemble_rejects_leftover_from_other_threshold(tmp_path):
    # the member dir holds ONLY a file from some earlier run at a different
    # threshold: a stale prediction must never silently substitute for the
    # requested one, unambiguous or not
    _member(tmp_path, "m_c", "deepAI_result_threshold=0.6.jsonl", [0.9])
    with pytest.raises(FileNotFoundError):
        _run_ensemble(tmp_path, [["m_c", 0.5, 0.9]])


def test_ensemble_spec_threshold_file_wins_over_leftovers(tmp_path, capsys):
    # both a stale 0.6 file and the member's own 0.5 file exist: the spec
    # threshold picks the right one (the old single-candidate fallback
    # raised on this dir; the older-still one could read the stale file)
    _member(tmp_path, "m_d", "deepAI_result_threshold=0.6.jsonl", [0.1])
    _member(tmp_path, "m_d", "deepAI_result_threshold=0.5.jsonl", [0.9])
    rc = _run_ensemble(tmp_path, [["m_d", 0.5, 0.9]])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pairs"] == 1


def test_train_sh_start_at_skips_completed_steps(tmp_path):
    # IA=echo turns every CLI invocation into a print: the gating itself is
    # what's under test (steps before START_AT print "(skipped", later steps
    # execute their $IA command)
    env = dict(os.environ, IA="echo IA-CMD", DATA_DIR=str(tmp_path),
               START_AT="5", EPOCHS="1", KGE_EPOCHS="1", BERT_EPOCHS="1")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "train.sh")],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=60)
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.splitlines()
    # all 11 step markers print, in order
    marks = [ln for ln in lines if ln.startswith("=== [train.sh] step")]
    assert len(marks) >= 10
    # steps 0-4 are skipped; no IA command runs before the 5-textcnn marker
    i5 = next(i for i, ln in enumerate(lines) if "step 5-textcnn" in ln)
    before, after = lines[:i5], lines[i5:]
    assert not any(ln.startswith("IA-CMD") for ln in before)
    assert sum("(skipped" in ln for ln in before) == 5
    assert any(ln.startswith("IA-CMD finetune-text") for ln in after)
    assert any(ln.startswith("IA-CMD finetune-graph") for ln in after)


def test_train_sh_default_runs_from_step_zero(tmp_path):
    env = dict(os.environ, IA="echo IA-CMD", DATA_DIR=str(tmp_path))
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "train.sh")],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=60)
    assert proc.returncode == 0, proc.stderr
    first_cmd = next(ln for ln in proc.stdout.splitlines()
                     if ln.startswith("IA-CMD"))
    assert first_cmd.startswith("IA-CMD prepare")
    assert "(skipped" not in proc.stdout


def test_retry_transient_retries_then_succeeds():
    from item_alignment_tpu.cli import _retry_transient
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: remote_compile: Broken pipe")
        return "ok"

    assert _retry_transient(flaky, attempts=4, wait=0.0) == "ok"
    assert len(calls) == 3


def test_retry_transient_reraises_non_transient():
    from item_alignment_tpu.cli import _retry_transient

    def bad():
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        _retry_transient(bad, attempts=4, wait=0.0)


def test_train_sh_stop_after_exits_after_step(tmp_path):
    env = dict(os.environ, IA="echo IA-CMD", DATA_DIR=str(tmp_path),
               START_AT="4", STOP_AFTER="4", EPOCHS="1", KGE_EPOCHS="1",
               BERT_EPOCHS="1")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "train.sh")],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=60)
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.splitlines()
    # step 4 runs, step 5's mark still prints (it bounds step 4's duration
    # for the log summarizer) followed by the stop note, nothing after
    cmds = [ln for ln in lines if ln.startswith("IA-CMD")]
    assert cmds and all("finetune-text" in c for c in cmds)
    assert any("(stopping: STOP_AFTER=4)" in ln for ln in lines)
    assert not any("textcnn" in c for c in cmds)
