"""Device-mesh construction.

The reference is single-process single-GPU (SURVEY.md §5.8); parallelism
here is a new TPU-native design: a ``jax.sharding.Mesh`` over ICI with
axes ``("data", "fsdp", "tensor")`` — DP baseline, optional ZeRO-style
parameter sharding, reserved tensor-parallel axis.  XLA inserts all
collectives (psum for DP grads, all-gathers for fsdp params).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from item_alignment_tpu.config import MeshConfig

AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_TENSOR = "tensor"
AXES = (AXIS_DATA, AXIS_FSDP, AXIS_TENSOR)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialization: ``jax.distributed.initialize``
    behind a flag (SURVEY.md §5.8).  On TPU pods the three arguments are
    auto-detected from the environment and may be left None; on CPU/GPU
    fleets pass them explicitly.  Must run before the backend is first
    used (i.e. before any array op / ``jax.devices()``)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def maybe_initialize_distributed_from_args(args) -> None:
    """CLI hook: ``--distributed [--coordinator_address --num_processes
    --process_id]`` on every Trainer-backed command."""
    if getattr(args, "distributed", False):
        initialize_distributed(
            getattr(args, "coordinator_address", None),
            getattr(args, "num_processes", None),
            getattr(args, "process_id", None))


def create_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    if config.data != -1:
        # fully explicit mesh: take just the devices it needs
        need = config.data * max(config.fsdp, 1) * max(config.tensor, 1)
        assert need <= len(devices), (
            f"mesh needs {need} devices, only {len(devices)} available")
        devices = devices[:need]
    data, fsdp, tensor = config.axis_sizes(len(devices))
    arr = np.array(devices).reshape(data, fsdp, tensor)
    return Mesh(arr, AXES)
