"""Sparse (edge-list) ops for graph models.

The reference's GCN consumes a pre-built ``torch_sparse`` adjacency
(``finetune_graph.py:190-194``).  On TPU the idiomatic representation is a
static-shape COO edge list; SpMM is a gather + ``segment_sum`` which XLA
lowers to efficient scatter-adds.  Pad the edge list to a fixed size with
zero-weight self-loops so jit never recompiles.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def spmm(edge_index: jax.Array, edge_weight: jax.Array, x: jax.Array,
         n_nodes: int, edge_chunk: Optional[int] = None) -> jax.Array:
    """(A @ x) with A given as COO: edge_index [2, E] (src, dst),
    edge_weight [E].  Messages flow src -> dst.

    ``edge_chunk``: process the edge list in fixed-size chunks under a
    ``lax.scan`` instead of one monolithic gather+scatter.  At reference
    scale (230k nodes x 2M edges x 1024-d, finetune_graph.py:312) the
    single-shot formulation materializes a [E, F] message buffer (8 GB
    fp32) per layer — fwd+bwd of a 4-layer stack cannot fit/compile; the
    scan keeps the live buffer at [chunk, F] and XLA reuses it across
    iterations.  E must be divisible by edge_chunk (use ``pad_edges``)."""
    src, dst = edge_index[0], edge_index[1]
    if edge_chunk is None or edge_chunk >= src.shape[0]:
        messages = x[src] * edge_weight[:, None]
        return jax.ops.segment_sum(messages, dst, num_segments=n_nodes)
    E = src.shape[0]
    assert E % edge_chunk == 0, (
        f"{E} edges not divisible by edge_chunk={edge_chunk}; pad with "
        "pad_edges first")
    n_chunks = E // edge_chunk
    chunks = (src.reshape(n_chunks, edge_chunk),
              dst.reshape(n_chunks, edge_chunk),
              edge_weight.reshape(n_chunks, edge_chunk))

    def body(acc, chunk):
        s, d, w = chunk
        msgs = x[s] * w[:, None]
        return acc + jax.ops.segment_sum(msgs, d, num_segments=n_nodes), None

    acc0 = jnp.zeros((n_nodes, x.shape[-1]), x.dtype)
    acc, _ = jax.lax.scan(body, acc0, chunks)
    return acc


def normalize_adjacency(edge_index: np.ndarray, n_nodes: int,
                        add_self_loops: bool = True
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric GCN normalization D^-1/2 (A + I) D^-1/2 in numpy
    (offline, done once)."""
    src, dst = edge_index
    if add_self_loops:
        loops = np.arange(n_nodes)
        src = np.concatenate([src, loops])
        dst = np.concatenate([dst, loops])
    deg = np.bincount(dst, minlength=n_nodes).astype(np.float32)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1.0))
    w = dinv[src] * dinv[dst]
    return np.stack([src, dst]).astype(np.int32), w.astype(np.float32)


def pad_edges(edge_index: np.ndarray, edge_weight: np.ndarray,
              target_edges: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the edge list to a static size with zero-weight (0,0) edges."""
    e = edge_index.shape[1]
    assert target_edges >= e, f"target {target_edges} < {e} edges"
    pad = target_edges - e
    ei = np.concatenate([edge_index, np.zeros((2, pad), edge_index.dtype)], 1)
    ew = np.concatenate([edge_weight, np.zeros(pad, edge_weight.dtype)])
    return ei, ew
