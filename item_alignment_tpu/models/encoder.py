"""BERT/RoBERTa-style transformer encoder (Flax Linen), TPU-first.

Replaces the reference's dependency on HuggingFace ``RobertaEncoder``
(``src/models/text.py:1108``).  Post-LN BERT blocks; attention runs through
``ops.attention`` which dispatches to a Pallas fused kernel on TPU.

Sharding: weights carry logical axis metadata via ``nn.with_partitioning``
so a mesh rule set can lay q/k/v/mlp kernels across a ``tensor`` axis and
everything else across ``fsdp`` (see ``parallel/sharding.py``).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.ops.attention import (
    dot_product_attention,
    flash_attention,
    make_attention_bias,
)
from item_alignment_tpu.ops.dropout import ReplayDropout

ACT = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
}


def _compute_dtype(cfg: ModelConfig):
    """Compute dtype for matmuls/LN (params stay fp32).  Must be passed to
    every flax module explicitly: with the default ``dtype=None`` flax
    PROMOTES bf16 inputs back to fp32 against the fp32 params, silently
    undoing the bf16 policy (and halving MXU throughput)."""
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with the matmul on the int8 MXU path
    (``ops/quant.py``): dynamic per-token activation scales x per-channel
    weight scales, int32 accumulation.  Same param names/shapes as
    ``nn.Dense`` ("kernel", "bias"), so finetuned fp32 checkpoints load
    unchanged — quantization happens inside the jitted apply."""

    features: int
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        from item_alignment_tpu.ops.quant import int8_matmul

        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return int8_matmul(x, kernel, bias, out_dtype=self.dtype)


def _dense_cls(cfg: ModelConfig):
    """The encoder's dense-projection class: int8 MXU path when the
    inference knob ``cfg.quant == "int8"`` is set, plain Dense otherwise."""
    return QuantDense if cfg.quant == "int8" else nn.Dense


class _DenseParams(nn.Module):
    """Declares nn.Dense-shaped params (kernel/bias) WITHOUT the matmul, so
    a fused caller can concatenate them; same tree path/shape/init as an
    nn.Dense submodule of the same name, so checkpoints and the name-based
    sharding rules (parallel/sharding.py) are unaffected."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class SelfAttention(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, hidden, bias, deterministic: bool = True):
        cfg = self.config
        dt = _compute_dtype(cfg)
        B, S, H = hidden.shape
        N, D = cfg.num_attention_heads, cfg.head_dim
        init = nn.initializers.normal(cfg.initializer_range)
        if cfg.fuse_qkv and cfg.quant != "int8":
            # one [H, 3H] matmul instead of three [H, H]: the activations
            # stream from HBM once instead of three times per layer (the
            # runtime concat of the three fp32 kernels is ~100x cheaper
            # than one re-read of the [B*S, H] activations).  Param tree
            # is IDENTICAL to the unfused path — checkpoints interchange.
            wq, bq = _DenseParams(H, init, name="query")(H)
            wk, bk = _DenseParams(H, init, name="key")(H)
            wv, bv = _DenseParams(H, init, name="value")(H)
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
            b = jnp.concatenate([bq, bk, bv]).astype(dt)
            qkv = hidden.astype(dt) @ w + b
            q, k, v = (t.reshape(B, S, N, D)
                       for t in jnp.split(qkv, 3, axis=-1))
        else:
            # NB int8 (cfg.quant) takes this path too, quantizing the
            # activations per projection: sharing one quantization pass
            # across the Q/K/V trio was tried and measured at +0.4%
            # (282.7 vs 281.6 pairs/s on the 510-token cross-encoder,
            # benchlogs/r5/xenc_int8.log) — within noise, so the special
            # branch was reverted (round-5 resolution of the r4 verdict's
            # "win or revert").
            dense = lambda name: _dense_cls(cfg)(  # noqa: E731
                H, name=name, dtype=dt, kernel_init=init)
            q = dense("query")(hidden).reshape(B, S, N, D)
            k = dense("key")(hidden).reshape(B, S, N, D)
            v = dense("value")(hidden).reshape(B, S, N, D)

        dropout_rng = None
        rate = cfg.attention_probs_dropout_prob
        if not deterministic and rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        attend = flash_attention if cfg.use_flash_attention else dot_product_attention
        ctx = attend(q, k, v, bias, dropout_rate=0.0 if deterministic else rate,
                     dropout_rng=dropout_rng, dtype=hidden.dtype)
        out = _dense_cls(cfg)(
            H, name="output", dtype=dt,
            kernel_init=nn.initializers.normal(cfg.initializer_range))(
            ctx.reshape(B, S, H))
        return out


class TransformerLayer(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, hidden, bias, deterministic: bool = True):
        cfg = self.config
        dt = _compute_dtype(cfg)
        # replay dropout: the backward regenerates the keep mask from the
        # PRNG key instead of saving a [B, S, H] mask residual per site
        # (2 sites x 24 layers on the flagship — see ops/dropout.py)
        drop = ReplayDropout(cfg.hidden_dropout_prob)
        attn_out = SelfAttention(cfg, name="attention")(hidden, bias, deterministic)
        attn_out = drop(attn_out, deterministic=deterministic)
        # LN stats are always computed in fp32 internally (flax); dtype=dt
        # keeps the residual stream in the compute dtype
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                              name="attention_layer_norm")(hidden + attn_out)

        act = ACT[cfg.hidden_act]
        # the [B, S, 4H] wide MLP pre-activation is the largest residual;
        # remat_policy == "mlp" drops exactly this matmul's output (keyed
        # on its [H, 4H] rhs shape in TransformerEncoder's policy below)
        mlp = _dense_cls(cfg)(
            cfg.intermediate_size, name="intermediate", dtype=dt,
            kernel_init=nn.initializers.normal(cfg.initializer_range))(hidden)
        mlp = act(mlp)
        mlp = _dense_cls(cfg)(
            cfg.hidden_size, name="mlp_output", dtype=dt,
            kernel_init=nn.initializers.normal(cfg.initializer_range))(mlp)
        mlp = drop(mlp, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                              name="output_layer_norm")(hidden + mlp)
        return hidden


class TransformerEncoder(nn.Module):
    """Stack of post-LN layers; returns all hidden states (embeddings first),
    matching HF's ``output_hidden_states=True`` used for ``cls_layers``."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> List[jax.Array]:
        cfg = self.config
        bias = None
        if attention_mask is not None:
            bias = make_attention_bias(attention_mask, dtype=jnp.float32)
        layer_cls = TransformerLayer
        if cfg.remat:
            # trade recompute for HBM: activations rematerialized in the
            # backward pass (replaces torch gradient checkpointing).
            # "dots" keeps every matmul output resident and re-runs only the
            # cheap elementwise chain (bias/softmax/gelu/LN) — on TPU this
            # recovers most of full-remat's memory saving at a fraction of
            # the recompute FLOPs; "full" recomputes the entire layer.
            policy = None
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif cfg.remat_policy == "mlp":
                # "dots" minus the wide MLP matmul: saveable = non-batch
                # dot_generals EXCEPT the one whose rhs is the [H, 4H]
                # intermediate kernel, so the [B, S, 4H] pre-activation is
                # recomputed in the backward (one extra matmul per layer)
                # and every other matmul output stays resident.  This is a
                # strictly SMALLER residual set than "dots" — the round-4
                # formulation (`save_anything_except_these_names`) marked
                # every unnamed intermediate saveable, a LARGER set than
                # plain AD's XLA-chosen residuals, and compile-OOMed at
                # bs 32/64 (21.25G vs 15.75G, COVERAGE.md round-4 A/B).
                dots = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                wide = int(cfg.intermediate_size)

                def policy(prim, *avals, **params):
                    if not dots(prim, *avals, **params):
                        return False
                    if (prim.name == "dot_general" and len(avals) >= 2
                            and getattr(avals[-1], "ndim", 0) == 2
                            and avals[-1].shape[-1] == wide):
                        return False
                    return True
            layer_cls = nn.remat(TransformerLayer, policy=policy,
                                 static_argnums=(3,))  # deterministic
        states = [hidden]
        for i in range(cfg.num_hidden_layers):
            hidden = layer_cls(cfg, name=f"layer_{i}")(hidden, bias, deterministic)
            states.append(hidden)
        return states


class Pooler(nn.Module):
    """dense+tanh over [CLS] (HF RobertaPooler)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden):
        x = hidden[:, 0]
        return jnp.tanh(nn.Dense(self.config.hidden_size, name="dense")(x))
