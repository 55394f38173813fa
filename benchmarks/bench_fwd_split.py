"""Isolate the training-forward MFU gap (VERDICT r3 #1).

The flagship train step plateaus at ~50% MFU while deterministic inference
runs 60.6%; the named suspect is the dropout-on forward.  This bench times
the SAME forward (RobertaOneTower loss, bs 16) under four dropout configs —
none / attention-only / hidden-only / both — plus a deterministic batch
sweep, so the tax splits between the in-kernel attention-dropout draws
(``ops/pallas_attention.py``) and the XLA ``nn.Dropout`` sites, and the
batch-size effect is visible separately.

Reference hot loop being replaced: ``finetune_text.py:401-415``.
Run manually: ``python benchmarks/bench_fwd_split.py``.
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def build(attn_drop: float, hidden_drop: float, batch: int):
    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    cfg = ModelConfig.roberta_large(
        max_seq_len=50, max_seq_len_pv=205, dtype="bfloat16",
        hidden_dropout_prob=hidden_drop,
        attention_probs_dropout_prob=attn_drop)
    model = RobertaOneTower(cfg)
    rng = jax.random.PRNGKey(0)
    S = cfg.pair_seq_len
    ids = jax.random.randint(rng, (batch, S), 1, cfg.vocab_size, jnp.int32)
    mask = jnp.ones((batch, S), jnp.int32)
    labels = jnp.zeros((batch,), jnp.int32)
    params = jax.jit(model.init)({"params": rng, "dropout": rng},
                                 ids, mask, labels=labels)["params"]
    deterministic = attn_drop == 0.0 and hidden_drop == 0.0

    @jax.jit
    def fwd(p, x, m, l):
        return model.apply(
            {"params": p}, x, m, labels=l, deterministic=deterministic,
            rngs={"dropout": jax.random.key(0, impl="rbg")}).loss

    return fwd, (params, ids, mask, labels), cfg


def timed(fn, args, iters=8):
    np.asarray(fn(*args))  # compile + fence (remote tunnel)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        t = (time.perf_counter() - t0) / iters
        best = t if best is None or t < best else t
    return best


def main():
    rows = []
    B = 16
    for name, a, h, b in [
        ("deterministic", 0.0, 0.0, B),
        ("attn_dropout_only", 0.1, 0.0, B),
        ("hidden_dropout_only", 0.0, 0.1, B),
        ("both", 0.1, 0.1, B),
        ("deterministic_bs64", 0.0, 0.0, 64),
    ]:
        fwd, args, cfg = build(a, h, b)
        dt = timed(fwd, args)
        H, I, L, S = (cfg.hidden_size, cfg.intermediate_size,
                      cfg.num_hidden_layers, cfg.pair_seq_len)
        flops = b * L * (2 * S * (4 * H * H + 2 * H * I) + 4 * S * S * H)
        rows.append({"config": name, "batch": b,
                     "fwd_ms": round(dt * 1000, 2),
                     "fwd_mfu": round(flops / dt / 197e12, 3)})
        print(json.dumps(rows[-1]), flush=True)
        jax.clear_caches()
    print(json.dumps({"metric": "fwd_dropout_split", "rows": rows}))


if __name__ == "__main__":
    main()
