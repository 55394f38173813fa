"""fused_adamw must match optax.adamw (with decay mask + schedule)
step-for-step, so the single-pass update is a pure performance change."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from item_alignment_tpu.config import OptimizerConfig
from item_alignment_tpu.engine.optim import (
    decay_mask,
    fused_adamw,
    linear_warmup_decay,
    make_optimizer,
)


def _tree(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "layer": {"kernel": jnp.asarray(rs.randn(8, 16), jnp.float32),
                  "bias": jnp.asarray(rs.randn(16), jnp.float32)},
        "layer_norm": {"scale": jnp.asarray(rs.randn(16), jnp.float32)},
        "embed": {"embedding": jnp.asarray(rs.randn(32, 8), jnp.float32)},
    }


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_fused_adamw_matches_optax(weight_decay):
    params = _tree()
    cfg = OptimizerConfig(learning_rate=1e-3, weight_decay=weight_decay,
                          total_steps=20)
    schedule = linear_warmup_decay(cfg)
    mask = decay_mask(params)
    ref_tx = optax.adamw(learning_rate=schedule, b1=cfg.b1, b2=cfg.b2,
                         eps=cfg.eps, weight_decay=weight_decay, mask=mask)
    fus_tx = fused_adamw(schedule, cfg.b1, cfg.b2, cfg.eps, weight_decay,
                         mask)
    ref_p, fus_p = params, params
    ref_s, fus_s = ref_tx.init(params), fus_tx.init(params)
    rs = np.random.RandomState(7)
    for step in range(5):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rs.randn(*p.shape), jnp.float32), params)
        ru, ref_s = ref_tx.update(grads, ref_s, ref_p)
        ref_p = optax.apply_updates(ref_p, ru)
        fu, fus_s = fus_tx.update(grads, fus_s, fus_p)
        fus_p = optax.apply_updates(fus_p, fu)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(ref_p),
                jax.tree_util.tree_leaves_with_path(fus_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"step {step} {ka}")


def test_make_optimizer_fused_runs_under_jit():
    params = _tree()
    cfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, fused=True)
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def step(p, s):
        u, s = tx.update(grads, s, p)
        return optax.apply_updates(p, u), s

    # two steps: the warmup schedule gives lr=0 at count 0
    p2, state = step(params, state)
    p2, _ = step(p2, state)
    assert not np.allclose(np.asarray(p2["layer"]["kernel"]),
                           np.asarray(params["layer"]["kernel"]))


def test_fused_adamw_bf16_state():
    """state_dtype='bfloat16': moments stored bf16, arithmetic fp32 —
    updates stay within the bf16 quantization envelope of the fp32 run."""
    params = _tree()
    cfg32 = OptimizerConfig(learning_rate=1e-3, total_steps=100, fused=True)
    cfg16 = OptimizerConfig(learning_rate=1e-3, total_steps=100, fused=True,
                            state_dtype="bfloat16")
    tx32, tx16 = make_optimizer(cfg32, params), make_optimizer(cfg16, params)
    s32, s16 = tx32.init(params), tx16.init(params)

    # the bf16 state really is bf16 (the memory claim)
    mus = jax.tree_util.tree_leaves(s16[0].mu if isinstance(s16, tuple)
                                    else s16.mu)
    assert all(m.dtype == jnp.bfloat16 for m in mus)

    rs = np.random.RandomState(0)
    p32 = p16 = params
    for _ in range(5):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rs.randn(*p.shape), jnp.float32), params)
        u, s32 = tx32.update(grads, s32, p32)
        p32 = optax.apply_updates(p32, u)
        u, s16 = tx16.update(grads, s16, p16)
        p16 = optax.apply_updates(p16, u)
    for a, b in zip(jax.tree_util.tree_leaves(p32),
                    jax.tree_util.tree_leaves(p16)):
        # direction agreement within ~1% of the param scale
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=2e-5)


def test_bf16_state_convergence_matches_fp32():
    """Training-level A/B for ``state_dtype='bfloat16'`` (the flagship
    recipe's memory lever): 60 AdamW steps on a tiny RobertaOneTower must
    reach the same loss basin as fp32 moments.  Guards the known bf16-Adam
    failure mode — the (1-b2)=1e-3 second-moment increments are below the
    bf16 ULP, so a *stored-state* accumulation (instead of the fused
    read-upcast/compute-fp32/write-downcast) would freeze nu and stall."""
    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    cfg = ModelConfig.roberta_large(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, vocab_size=120, max_seq_len=12,
        max_seq_len_pv=12, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    model = RobertaOneTower(cfg)
    rng = jax.random.PRNGKey(0)
    B, S = 8, cfg.pair_seq_len
    ids = jax.random.randint(rng, (B, S), 1, cfg.vocab_size, jnp.int32)
    masks = jnp.ones((B, S), jnp.int32)
    labels = jnp.asarray(np.arange(B) % 2, jnp.int32)
    params0 = jax.jit(model.init)(
        {"params": rng, "dropout": rng}, ids, masks,
        labels=labels)["params"]

    def run(state_dtype):
        ocfg = OptimizerConfig(learning_rate=3e-3, total_steps=60,
                               fused=True, state_dtype=state_dtype)
        tx = make_optimizer(ocfg, params0)
        s = tx.init(params0)
        p = params0

        @jax.jit
        def step(p, s):
            def loss_fn(p):
                return model.apply({"params": p}, ids, masks,
                                   labels=labels).loss
            loss, g = jax.value_and_grad(loss_fn)(p)
            u, s2 = tx.update(g, s, p)
            return optax.apply_updates(p, u), s2, loss

        first = None
        for _ in range(60):
            p, s, loss = step(p, s)
            if first is None:
                first = float(loss)
        return first, float(loss)

    first32, last32 = run("float32")
    _, last16 = run("bfloat16")
    drop32 = first32 - last32
    assert drop32 > 0.3 * first32, f"fp32 run failed to learn: {last32}"
    # bf16 moments must capture >=90% of the fp32 loss improvement
    assert (first32 - last16) > 0.9 * drop32, (
        f"bf16-moment training diverged from fp32: {last16} vs {last32}")
