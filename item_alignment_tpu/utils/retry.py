"""Retry helper for transient remote-device transport errors.

The remote-compile relay in this deployment occasionally drops a
connection mid-flight; observed failure modes (rehearsal, round 3):
``Broken pipe`` / ``UNAVAILABLE`` on /remote_compile, ``Connection
refused`` while the relay restarts, and ``DEADLINE_EXCEEDED`` on slow
compiles.  Device dispatches that do not donate their inputs are
idempotent, so retrying them is safe; donated-state train steps must NOT
be wrapped (a retry would replay with already-invalidated buffers).
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

from item_alignment_tpu.utils.logging import logger

T = TypeVar("T")

# substrings identifying errors worth retrying; anything else re-raises
# immediately (HTTP 413 "program too large", OOM, and shape errors are
# deterministic — retrying them only wastes the relay's time)
TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "Broken pipe",
    "remote_compile",
    "DEADLINE_EXCEEDED",
    "Connection refused",
    "Connection reset",
    "Socket closed",
    "failed to connect",
)


def retry_transient(fn: Callable[[], T], attempts: int = 4,
                    wait: float = 20.0) -> T:
    """Run ``fn`` with retries on transient remote-device transport errors.

    Non-transient errors re-raise immediately; the final attempt's error
    propagates whatever it is."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # pragma: no cover - device-env specific
            transient = any(t in str(e) for t in TRANSIENT_MARKERS)
            if i == attempts - 1 or not transient:
                raise
            logger.warning(
                f"transient device error ({e}); retry {i + 1}/"
                f"{attempts - 1} in {wait:.0f}s")
            time.sleep(wait)
    raise AssertionError("unreachable")
