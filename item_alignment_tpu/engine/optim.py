"""Optimizer factory: AdamW with the reference's no-decay groups and
linear warmup + linear decay schedule (``finetune_text.py:312-331``).

No weight decay on biases and LayerNorm parameters; betas (0.9, 0.98).
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from item_alignment_tpu.config import OptimizerConfig


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
    chain.append(
        optax.adamw(
            learning_rate=schedule, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
            weight_decay=cfg.weight_decay, mask=decay_mask(params),
        )
    )
    tx = optax.chain(*chain)
    if cfg.grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accumulation_steps)
    return tx
