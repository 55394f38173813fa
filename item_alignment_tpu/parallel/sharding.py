"""Parameter / batch sharding rules.

Rules map a flattened param path + shape to a ``PartitionSpec`` over the
``("data", "fsdp", "tensor")`` mesh:

- attention q/k/v and MLP-up kernels:  (in, out)  -> P(fsdp, tensor)
  (head/feature dim split across ``tensor`` => per-device partial heads,
  XLA all-reduces after the out-projection)
- attention-out and MLP-down kernels:  (in, out)  -> P(tensor, fsdp)
- embedding tables [V, H]:             -> P(None, fsdp) (replicated over
  tensor; vocab gathers stay local)
- biases on tensor-split outputs:      -> P(tensor)
- LayerNorm / everything small:        -> replicated

Anything that does not divide evenly falls back to replication — correct
by construction, just less sharded.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from item_alignment_tpu.parallel.mesh import AXIS_DATA, AXIS_FSDP, AXIS_TENSOR

# kernels whose OUTPUT feature dim is split across the tensor axis
_COL_PARALLEL = ("query", "key", "value", "intermediate")
# kernels whose INPUT feature dim is split across the tensor axis
_ROW_PARALLEL = ("attention/output", "mlp_output")


def _divides(n: Optional[int], size: int) -> bool:
    return n is not None and size > 0 and n % size == 0


def param_partition_spec(path: Tuple[str, ...], shape: Tuple[int, ...],
                         mesh: Mesh) -> P:
    names = "/".join(str(p) for p in path)
    fsdp = mesh.shape.get(AXIS_FSDP, 1)
    tensor = mesh.shape.get(AXIS_TENSOR, 1)
    leaf = path[-1] if path else ""

    if leaf == "embedding" and len(shape) == 2:
        if _divides(shape[1], fsdp):
            return P(None, AXIS_FSDP)
        return P()

    if leaf == "kernel" and len(shape) == 2:
        col = any(k in names for k in _COL_PARALLEL)
        row = any(k in names for k in _ROW_PARALLEL)
        in_ax = AXIS_TENSOR if (row and _divides(shape[0], tensor)) else (
            AXIS_FSDP if (col and _divides(shape[0], fsdp)) else None)
        out_ax = AXIS_TENSOR if (col and _divides(shape[1], tensor)) else (
            AXIS_FSDP if (row and _divides(shape[1], fsdp)) else None)
        if in_ax is None and out_ax is None:
            # generic dense: fsdp-shard the larger dim if it divides
            if _divides(shape[1], fsdp):
                return P(None, AXIS_FSDP)
            if _divides(shape[0], fsdp):
                return P(AXIS_FSDP, None)
            return P()
        return P(in_ax, out_ax)

    if leaf == "bias" and len(shape) == 1:
        if any(k in names for k in _COL_PARALLEL) and _divides(shape[0], tensor):
            return P(AXIS_TENSOR)
        return P()

    return P()  # LayerNorm scales, scalars, etc: replicated


def tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching ``tree`` (params or opt state)."""

    def spec_for(path, leaf):
        shape = np.shape(leaf)
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", getattr(k, "name", str(k))))
            for k in path
        )
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_partition_spec(keys, shape, mesh))

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh according to the rules."""
    shardings = tree_shardings(params, mesh)
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim over the data axis (dp)."""
    return NamedSharding(mesh, P(AXIS_DATA))


def process_slice(n_rows: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> slice:
    """This host's contiguous slice of a global batch (SURVEY.md §5.8
    per-``process_index`` data loading).  Requires n_rows divisible by the
    process count; mesh device order follows process order, so contiguous
    row blocks land on the devices that own them."""
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    assert n_rows % pc == 0, (
        f"global batch {n_rows} not divisible by {pc} processes")
    per = n_rows // pc
    return slice(pi * per, (pi + 1) * per)


def put_global_batch(sharding: NamedSharding, value: np.ndarray):
    """Place one batch array on the mesh.  Single-process: plain
    device_put.  Multi-process: each host contributes only its
    ``process_slice`` rows and the runtime assembles the global array
    (``jax.make_array_from_process_local_data``) — no host ever
    materializes another host's shard on device."""
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    value = np.asarray(value)
    local = value[process_slice(value.shape[0])]
    return jax.make_array_from_process_local_data(sharding, local,
                                                  value.shape)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
