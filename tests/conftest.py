"""Test config: force an 8-device CPU mesh so pjit/sharding tests run
without TPU hardware (the standard JAX recipe, see SURVEY.md §4)."""

import os

# NB: JAX_PLATFORMS is ignored by this environment's TPU plugin;
# JAX_PLATFORM_NAME is honored.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
