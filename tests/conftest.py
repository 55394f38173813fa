"""Test config: force an 8-device CPU mesh so pjit/sharding tests run
without TPU hardware (the standard JAX recipe, see SURVEY.md §4).

NB the environment's sitecustomize imports jax at interpreter startup
(before this file), so env vars alone are too late: ``jax.config.update``
overrides the captured ``JAX_PLATFORMS=axon``; XLA_FLAGS is still read
lazily at first backend init, so setting it here works.
"""

import os

# IA_TPU_TESTS=1 skips the CPU override so hardware-gated tests
# (test_pallas_kernel_tpu.py) can run on the real chip
_USE_TPU = os.environ.get("IA_TPU_TESTS") == "1"

# NB: JAX_PLATFORMS *is* read lazily at first backend init on current
# jax, so setting it here flips even an already-imported jax to CPU —
# it must therefore be gated on _USE_TPU or the hardware suite silently
# skips ("needs real TPU") despite IA_TPU_TESTS=1.
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config wins)

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    if _USE_TPU:
        return
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    assert jax.device_count() == 8, (
        f"expected 8 forced CPU devices, got {jax.device_count()}")
