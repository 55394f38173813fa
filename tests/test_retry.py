"""utils/retry.py: transient-error retry used around non-donating device
dispatches (eval/predict loops, pred-text encodes, pred-bert)."""

import pytest

from item_alignment_tpu.utils.retry import retry_transient


def test_retries_transient_then_succeeds():
    calls = []

    def fn():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("socket: Connection refused on /remote_compile")
        return "ok"

    assert retry_transient(fn, attempts=4, wait=0.0) == "ok"
    assert len(calls) == 3


def test_non_transient_raises_immediately():
    calls = []

    def fn():
        calls.append(1)
        raise ValueError("shape mismatch [4, 8] vs [4, 16]")

    with pytest.raises(ValueError):
        retry_transient(fn, attempts=4, wait=0.0)
    assert len(calls) == 1


def test_exhausted_attempts_reraise():
    def fn():
        raise RuntimeError("UNAVAILABLE: relay restarting")

    with pytest.raises(RuntimeError):
        retry_transient(fn, attempts=2, wait=0.0)
