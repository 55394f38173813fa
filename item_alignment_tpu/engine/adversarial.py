"""Adversarial embedding-noise training (FREE / PGD / MIX).

Functional re-design of the reference's delta bookkeeping
(``finetune_bert.py:425-512``): FGSM-style sign updates on persistent
embedding-space deltas, clamped to an epsilon ball.

- FREE:  delta <- clamp(delta + eps * sign(grad), +-eps)
- PGD:   delta <- clamp(U(-eps, eps) + alpha * sign(grad), +-eps)
- MIX:   per step draw u~U(0,1): u < p_free -> FREE, u < p_pgd -> PGD,
         else disable noise for that step (reference: 0.15 / 0.45)

The noise grads come for free from the same backward pass as the parameter
grads (``jax.grad`` over (params, noise)).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def free_update(delta: jax.Array, grad: jax.Array, epsilon: float) -> jax.Array:
    return jnp.clip(delta + epsilon * jnp.sign(grad), -epsilon, epsilon)


def pgd_update(rng: jax.Array, delta: jax.Array, grad: jax.Array,
               epsilon: float, alpha: float) -> jax.Array:
    restart = jax.random.uniform(rng, delta.shape, minval=-epsilon,
                                 maxval=epsilon)
    return jnp.clip(restart + alpha * jnp.sign(grad), -epsilon, epsilon)


def mix_update(rng: jax.Array, delta: jax.Array, grad: jax.Array,
               epsilon: float, alpha: float,
               p_free: float = 0.15, p_pgd: float = 0.45,
               u: Optional[jax.Array] = None
               ) -> Tuple[jax.Array, jax.Array]:
    """Returns (new_delta, active) where active=0 disables noise next step.
    One shared draw ``u`` per step decides FREE/PGD/off for ALL deltas
    (the reference draws a single rand, finetune_bert.py:486)."""
    k1, k2 = jax.random.split(rng)
    if u is None:
        u = jax.random.uniform(k1)
    new_delta = jax.lax.cond(
        u < p_free,
        lambda: free_update(delta, grad, epsilon),
        lambda: jax.lax.cond(
            u < p_pgd,
            lambda: pgd_update(k2, delta, grad, epsilon, alpha),
            lambda: delta))
    active = (u < p_pgd).astype(jnp.float32)
    return new_delta, active


def update_deltas(mode: str, rng: jax.Array, deltas: Any, dgrads: Any,
                  epsilon: float, alpha: float) -> Any:
    """One FREE/PGD/MIX update of a delta pytree from its loss grads.

    MIX semantics (finetune_bert.py:486-512): a SINGLE uniform draw per
    step picks FREE (<0.15), PGD (<0.45) or "noise off" — the off branch
    zeroes the noise applied on the next step.
    """
    n_leaves = len(jax.tree_util.tree_leaves(deltas))
    keys = jax.random.split(rng, n_leaves + 1)
    key_tree = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(deltas), list(keys[:n_leaves]))
    if mode == "FREE":
        return jax.tree_util.tree_map(
            lambda d, g: free_update(d, g, epsilon), deltas, dgrads)
    if mode == "PGD":
        return jax.tree_util.tree_map(
            lambda k, d, g: pgd_update(k, d, g, epsilon, alpha),
            key_tree, deltas, dgrads)
    if mode == "MIX":
        u = jax.random.uniform(keys[-1])  # one draw for all deltas
        active = (u < 0.45).astype(jnp.float32)
        return jax.tree_util.tree_map(
            lambda k, d, g: mix_update(k, d, g, epsilon, alpha, u=u)[0]
            * active,
            key_tree, deltas, dgrads)
    raise ValueError(f"unknown adversarial mode {mode}")


def make_adversarial_step(loss_fn: Callable, tx, mode: str = "FREE",
                          epsilon: float = 1e-2, alpha: float = 1e-2):
    """Build a jitted step: (params, opt_state, deltas, rng, batch) ->
    (params, opt_state, deltas, loss).

    ``loss_fn(params, deltas, batch) -> scalar``; ``deltas`` is a pytree of
    noise arrays (e.g. {"pvs": [B,512,H], "title": [B,150,H]}).

    MIX semantics (finetune_bert.py:486-512): a SINGLE uniform draw per
    step picks FREE (<0.15), PGD (<0.45) or "noise off" — on the off
    branch the next step's applied noise is zeroed (the stored deltas are
    kept, matching the reference which keeps the tensors but skips
    applying them for one step).
    """
    import optax

    def step(params, opt_state, deltas, rng, batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p, d: (loss_fn(p, d, batch), 0.0), argnums=(0, 1),
            has_aux=True)(params, deltas)
        pgrads, dgrads = grads
        updates, opt_state = tx.update(pgrads, opt_state, params)
        params = optax.apply_updates(params, updates)
        deltas = update_deltas(mode, rng, deltas, dgrads, epsilon, alpha)
        return params, opt_state, deltas, loss

    return jax.jit(step)
