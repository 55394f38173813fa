"""bench.py's perf-regression gate: fires on >2% drops against BOTH the
newest round record (BENCH_r{N}.json) and the blessed best-known-good
(BASELINE_BENCH.json) — VERDICT r4 weak #4: the adjacent-round-only gate
let three sub-2% slides pass silently."""

import importlib.util
import json
import os

import pytest


@pytest.fixture(scope="module")
def gate():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(root, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._regression_gate


def _arena(tmp_path, prev=None, blessed=None):
    if prev is not None:
        (tmp_path / "BENCH_r07.json").write_text(
            json.dumps({"parsed": prev}))
    if blessed is not None:
        (tmp_path / "BASELINE_BENCH.json").write_text(
            json.dumps({"metrics": blessed}))
    return str(tmp_path)


def test_fires_on_round_over_round_drop(gate, tmp_path):
    here = _arena(tmp_path, prev={"value": 100.0})
    out = gate({"value": 90.0}, here=here)
    assert out["value"]["prev"] == 100.0
    assert out["value"]["prev_pct"] == -10.0


def test_fires_on_cumulative_drift_even_when_adjacent_round_passes(
        gate, tmp_path):
    # three 1.5% slides: each adjacent comparison is under the 2% gate,
    # but vs the blessed baseline the drift has compounded past it
    here = _arena(tmp_path, prev={"value": 98.5},
                  blessed={"value": 100.0})
    out = gate({"value": 97.0}, here=here)
    assert "prev" not in out.get("value", {})
    assert out["value"]["blessed"] == 100.0
    assert out["value"]["blessed_pct"] == -3.0


def test_silent_within_tolerance(gate, tmp_path):
    here = _arena(tmp_path, prev={"value": 100.0},
                  blessed={"value": 100.0})
    assert gate({"value": 99.0}, here=here) == {}


def test_improvements_never_fire(gate, tmp_path):
    here = _arena(tmp_path, prev={"value": 100.0},
                  blessed={"value": 100.0})
    assert gate({"value": 140.0}, here=here) == {}


def test_missing_baseline_files_are_not_fatal(gate, tmp_path):
    assert gate({"value": 1.0}, here=str(tmp_path)) == {}


def test_repo_blessed_values_are_post_correctness_fix(gate):
    """The committed BASELINE_BENCH.json must bless the post-exact-max-fix
    numbers, not the faster-but-wrong pre-fix kernels (r1 mining 79,079.6 /
    r2 cross-encoder 378.7)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    blessed = json.load(
        open(os.path.join(root, "BASELINE_BENCH.json")))["metrics"]
    assert blessed["value"] < 79079.6
    assert blessed["flagship_cross_encoder_pairs_per_sec"] < 378.7
    r4 = json.load(open(os.path.join(root, "BENCH_r04.json")))["parsed"]
    # blessed >= the last recorded round for every watched metric --
    # otherwise the "best-known-good" is stale
    for key in ("value", "flagship_cross_encoder_pairs_per_sec",
                "flagship_train_pairs_per_sec"):
        assert blessed[key] >= r4[key] * 0.995, key
