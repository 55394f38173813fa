"""Int8 inference path for the dense projections (TPU MXU int8).

v5e executes int8 matmuls at 2x the bf16 rate (394 TOPS vs 197 TFLOP/s),
and at S=512 the dense projections dominate the cross-encoder's FLOPs
(per layer: QKV+out 4*S*D^2 + MLP 8*S*D^2 = 12*S*D^2 vs attention's
4*S^2*D — 6x at D=1024).  Quantizing ONLY the dense layers therefore
buys most of the int8 speedup while the softmax/attention chain keeps
its bf16 Pallas kernel numerics.

Scheme (symmetric, zero-point-free — the MXU path needs no asymmetric
correction term):
- weights: per-output-channel absmax scales, quantized inside the jitted
  apply from the fp32 params (cost is O(D^2) elementwise vs the matmul's
  O(B*S*D^2) — <1% at batch 16+; checkpoints stay fp32 and load
  unchanged)
- activations: dynamic per-row (per-token) absmax scales; no calibration
  corpus needed (the reference has none to offer for this, and dynamic
  row scales track the post-LN activation distribution exactly)
- accumulation: int8 x int8 -> int32 via ``preferred_element_type``,
  dequantized by the rank-1 outer product of the two scale vectors.

This is an inference knob (``ModelConfig.quant="int8"``): training keeps
the bf16 path (straight-through int8 training is out of scope — the
reference never trains quantized either).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8  # guard all-zero rows/channels (padding tokens)


def quantize_rowwise(x: jax.Array):
    """[..., D] -> int8 values with per-row (leading dims) absmax scales.

    Returns ``(x_q, scale)`` with ``x ~= x_q * scale`` and
    ``scale = absmax / 127`` shaped ``[..., 1]``."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x_q.astype(jnp.int8), scale


def quantize_colwise(w: jax.Array):
    """[D_in, D_out] -> int8 with per-output-channel absmax scales.

    Returns ``(w_q, scale)`` with ``w ~= w_q * scale`` and scale shaped
    ``[1, D_out]``."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return w_q.astype(jnp.int8), scale


def int8_matmul_prequant(x_q: jax.Array, x_scale: jax.Array,
                         kernel: jax.Array, bias=None,
                         out_dtype=jnp.float32) -> jax.Array:
    """int8 MXU matmul with ALREADY-quantized activations (the core of
    ``int8_matmul``; activation quantization is split out so a caller
    with several projections off one input could share it).

    NB sharing the quantization pass across the encoder's Q/K/V trio was
    tried and measured at +0.4% on the 510-token cross-encoder (282.7 vs
    281.6 pairs/s, benchlogs/r5/xenc_int8.log) — within noise; the
    encoder keeps the plain per-projection path."""
    w_q, w_scale = quantize_colwise(kernel)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # [rows, D_out] int32
    y = acc.astype(jnp.float32) * (x_scale * w_scale)  # rank-1 dequant
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_matmul(x: jax.Array, kernel: jax.Array, bias=None,
                out_dtype=jnp.float32) -> jax.Array:
    """``x @ kernel + bias`` with both operands dynamically quantized to
    int8 and accumulated in int32 on the MXU.

    ``x``: [..., D_in] (any float dtype), ``kernel``: [D_in, D_out] fp32
    params.  The result is dequantized to ``out_dtype``."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    x_q, x_scale = quantize_rowwise(x2)
    y = int8_matmul_prequant(x_q, x_scale, kernel, bias, out_dtype)
    return y.reshape(*lead, kernel.shape[-1])
