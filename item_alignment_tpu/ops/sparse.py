"""Sparse (edge-list) ops for graph models.

The reference's GCN consumes a pre-built ``torch_sparse`` adjacency
(``finetune_graph.py:190-194``).  On TPU the idiomatic representation is a
static-shape COO edge list; SpMM is a gather + ``segment_sum`` which XLA
lowers to efficient scatter-adds.  Pad the edge list to a fixed size with
zero-weight self-loops so jit never recompiles.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _spmm_impl(edge_index: jax.Array, edge_weight: jax.Array, x: jax.Array,
               n_nodes: int, edge_chunk: Optional[int],
               sorted_by_dst: bool = False) -> jax.Array:
    src, dst = edge_index[0], edge_index[1]
    if edge_chunk is None or edge_chunk >= src.shape[0]:
        messages = x[src] * edge_weight[:, None]
        return jax.ops.segment_sum(messages, dst, num_segments=n_nodes,
                                   indices_are_sorted=sorted_by_dst)
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
        return acc + jax.ops.segment_sum(
            msgs, d, num_segments=n_nodes,
            indices_are_sorted=sorted_by_dst), None

    acc0 = jnp.zeros((n_nodes, x.shape[-1]), x.dtype)
    acc, _ = jax.lax.scan(body, acc0, chunks)
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def spmm(edge_index: jax.Array, edge_weight: jax.Array, x: jax.Array,
         n_nodes: int, edge_chunk: Optional[int] = None,
         sorted_by_dst: bool = False,
         transpose: Optional[Tuple[jax.Array, jax.Array]] = None
         ) -> jax.Array:
    """(A @ x) with A given as COO: edge_index [2, E] (src, dst),
    edge_weight [E].  Messages flow src -> dst.

    TPU-scale knobs (reference scale: 230k nodes x 2M edges,
    finetune_graph.py:312):

    - ``sorted_by_dst``: edges pre-sorted by dst (``sort_edges_by_dst``)
      let the scatter lower with ``indices_are_sorted=True`` — measured
      8x faster TPU COMPILE (295s -> 37s per 2M-edge scatter) and ~25%
      faster execution.  The unsorted monolithic fwd+bwd never finished
      compiling through the compile relay.
    - ``transpose``: the pre-built transpose edge list (ALSO sorted by its
      dst; ``transpose_edges``) used by the custom VJP, so the backward
      dx = A^T g is again a sorted spmm.  Without it the VJP swaps the
      forward list on the fly (correct, but unsorted backward scatter).
    - ``edge_chunk``: process edges in fixed-size chunks under a
      ``lax.scan``, bounding the transient [E, F] message buffer.

    Custom VJP: dx is just another spmm (dx[s] += w_e * g[d]) —
    structurally identical to the forward, so the compiler never sees
    autodiff's generic gather-transpose scatter."""
    return _spmm_impl(edge_index, edge_weight, x, n_nodes, edge_chunk,
                      sorted_by_dst)


def _spmm_fwd(edge_index, edge_weight, x, n_nodes, edge_chunk,
              sorted_by_dst, transpose=None):
    return (_spmm_impl(edge_index, edge_weight, x, n_nodes, edge_chunk,
                       sorted_by_dst),
            (edge_index, edge_weight, x, transpose))


def _spmm_bwd(n_nodes, edge_chunk, sorted_by_dst, res, g):
    edge_index, edge_weight, x, transpose = res
    assert x.shape[0] == n_nodes, "custom spmm VJP assumes a square A"
    if transpose is not None:
        ti, tw = transpose
        dx = _spmm_impl(ti, tw, g, n_nodes, edge_chunk, sorted_by_dst)
    else:
        swapped = jnp.stack([edge_index[1], edge_index[0]])
        dx = _spmm_impl(swapped, edge_weight, g, n_nodes, edge_chunk, False)

    # dw_e = x[src_e] . g[dst_e], chunked like the forward (gathers only)
    src, dst = edge_index[0], edge_index[1]
    E = src.shape[0]
    if edge_chunk is None or edge_chunk >= E:
        dw = jnp.sum(x[src] * g[dst], axis=-1)
    else:
        n_chunks = E // edge_chunk

        def body(_, chunk):
            s, d = chunk
            return 0, jnp.sum(x[s] * g[d], axis=-1)

        _, dw = jax.lax.scan(
            body, 0, (src.reshape(n_chunks, edge_chunk),
                      dst.reshape(n_chunks, edge_chunk)))
        dw = dw.reshape(E)
    # the transpose list is a derived copy of (edge_index, edge_weight):
    # its cotangent is None by convention (weights get their grad via dw)
    return None, dw, dx, None


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def sort_edges_by_dst(edge_index: np.ndarray, edge_weight: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Stable-sort a COO edge list by destination (offline, once) so the
    on-device scatter can run with ``indices_are_sorted=True``."""
    order = np.argsort(np.asarray(edge_index)[1], kind="stable")
    return (np.asarray(edge_index)[:, order],
            np.asarray(edge_weight)[order])


def transpose_edges(edge_index: np.ndarray, edge_weight: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """The swapped (dst, src) edge list, sorted by ITS destination — the
    backward pass's adjacency (offline, once)."""
    swapped = np.stack([np.asarray(edge_index)[1],
                        np.asarray(edge_index)[0]])
    return sort_edges_by_dst(swapped, edge_weight)


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
              target_edges: int, pad_dst: int = 0
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the edge list to a static size with zero-weight (0, pad_dst)
    edges.  For dst-sorted lists pass ``pad_dst=n_nodes-1`` so the
    padding keeps the list sorted (``indices_are_sorted`` stays legal)."""
    e = edge_index.shape[1]
    assert target_edges >= e, f"target {target_edges} < {e} edges"
    pad = target_edges - e
    pad_block = np.zeros((2, pad), edge_index.dtype)
    pad_block[1, :] = pad_dst
    ei = np.concatenate([edge_index, pad_block], 1)
    ew = np.concatenate([edge_weight, np.zeros(pad, edge_weight.dtype)])
    return ei, ew
