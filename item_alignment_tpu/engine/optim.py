"""Optimizer factory: AdamW with the reference's no-decay groups and
linear warmup + linear decay schedule (``finetune_text.py:312-331``).

No weight decay on biases and LayerNorm parameters; betas (0.9, 0.98).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from item_alignment_tpu.config import OptimizerConfig


class FusedAdamWState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def fused_adamw(schedule, b1: float, b2: float, eps: float,
                weight_decay: float, mask_tree: Any,
                state_dtype: Any = jnp.float32
                ) -> optax.GradientTransformation:
    """AdamW as ONE per-leaf pass (same math as ``optax.adamw`` with a
    decay mask and schedule, bias correction included).

    optax's chain (scale_by_adam -> add_decayed_weights -> scale) walks the
    tree three times; on a 330M-param model the update is pure HBM traffic,
    so a single fused pass that reads (g, mu, nu, p) and writes (u, mu, nu)
    once is the speed-of-light formulation (VERDICT r2 "train MFU" item:
    the AdamW update cost ~26ms/step).  ``mask_tree`` leaves are static
    Python bools (True = apply weight decay)."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros(p.shape, state_dtype)  # noqa: E731
        return FusedAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params))

    def update_fn(updates, state, params):
        assert params is not None, "fused_adamw needs params (weight decay)"
        count_inc = state.count + 1
        t = count_inc.astype(jnp.float32)
        lr = schedule(state.count)
        c1 = 1.0 - b1 ** t
        c2 = 1.0 - b2 ** t

        def leaf(g, mu, nu, p, decay):
            # moment arithmetic in fp32 even when the STORED moments are
            # bf16 (state_dtype): read-upcast, write-downcast
            g32 = g.astype(jnp.float32)
            mu2 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
            nu2 = b2 * nu.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)
            upd = (mu2 / c1) / (jnp.sqrt(nu2 / c2) + eps)
            if decay and weight_decay:
                upd = upd + weight_decay * p
            return (-lr * upd).astype(p.dtype), mu2.astype(mu.dtype), \
                nu2.astype(nu.dtype)

        fused = jax.tree.map(leaf, updates, state.mu, state.nu, params,
                             mask_tree)
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa: E731
        pick = lambda i: jax.tree.map(  # noqa: E731
            lambda x: x[i], fused, is_leaf=is_triple)
        return pick(0), FusedAdamWState(count=count_inc, mu=pick(1),
                                        nu=pick(2))

    return optax.GradientTransformation(init_fn, update_fn)


def decay_mask(params: Any) -> Any:
    """True (decay) for dense kernels and embedding tables; False for
    biases and LayerNorm scale/bias — matching the reference's
    ``no_decay = ["bias", "LayerNorm.weight"]`` grouping."""

    def is_decay(path, _):
        keys = [str(getattr(k, "key", k)) for k in path]
        leaf = keys[-1] if keys else ""
        in_layernorm = any("layer_norm" in k or "LayerNorm" in k for k in keys)
        return leaf in ("kernel", "embedding") and not in_layernorm

    return jax.tree_util.tree_map_with_path(is_decay, params)


def freeze_mask(params: Any, patterns) -> Any:
    """True (frozen) for leaves whose '/'-joined path contains any pattern.

    TPU equivalent of the reference's ``--parameters_to_freeze`` JSON list +
    ``requires_grad = False`` (``finetune_text.py:257-272``): frozen leaves
    get their final update zeroed, leaving them bitwise unchanged.  Dots in
    patterns are normalized to '/' so reference-style names
    (``embeddings.word_embeddings``) match flax paths."""
    pats = [str(p).replace(".", "/") for p in patterns]

    def frozen(path, _):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return any(p in name for p in pats)

    return jax.tree_util.tree_map_with_path(frozen, params)


def linear_warmup_decay(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = max(int(cfg.total_steps * cfg.warmup_proportion), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, warmup),
            optax.linear_schedule(
                cfg.learning_rate, 0.0, max(cfg.total_steps - warmup, 1)),
        ],
        [warmup],
    )


def make_optimizer(cfg: OptimizerConfig, params: Any) -> optax.GradientTransformation:
    schedule = linear_warmup_decay(cfg)
    chain = []
    if cfg.max_grad_norm:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if cfg.fused:
        chain.append(fused_adamw(
            schedule, cfg.b1, cfg.b2, cfg.eps, cfg.weight_decay,
            decay_mask(params),
            state_dtype=jnp.dtype(getattr(cfg, "state_dtype", "float32"))))
    else:
        chain.append(
            optax.adamw(
                learning_rate=schedule, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                weight_decay=cfg.weight_decay, mask=decay_mask(params),
            )
        )
    if cfg.freeze_patterns:
        # zero the FINAL update (after adamw, which would otherwise still
        # apply weight decay to frozen kernels)
        chain.append(optax.masked(optax.set_to_zero(),
                                  freeze_mask(params, cfg.freeze_patterns)))
    tx = optax.chain(*chain)
    if cfg.grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accumulation_steps)
    return tx
