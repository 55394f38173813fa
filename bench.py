"""Benchmark: flagship RoBERTa-large one-tower cross-encoder inference
throughput (item-pairs/sec/chip) on real TPU hardware, bf16 + Pallas fused
attention.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 10_000 — the BASELINE.json north-star of
>=10k pairs/sec/chip (the reference never measured throughput; its 8-model
train run took ~58h on an 80GB GPU, README.md:443-444).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    cfg = ModelConfig.roberta_large(
        max_seq_len=50, max_seq_len_pv=205, dtype="bfloat16",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    model = RobertaOneTower(cfg)
    B, S = 32, cfg.pair_seq_len

    rng = jax.random.PRNGKey(0)
    input_ids = jax.random.randint(rng, (B, S), 1, cfg.vocab_size, dtype=jnp.int32)
    attention_mask = jnp.ones((B, S), jnp.int32)
    params = model.init({"params": rng}, input_ids, attention_mask)
    # cast params to bf16 for weight reads at HBM speed; logits come back fp32
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

    n_iters = 16

    # NB: all n_iters forwards run inside one jit via lax.scan (device-side
    # loop); a single host transfer closes the timing.  block_until_ready is
    # unreliable through the remote-TPU tunnel, so we time np.asarray.
    @jax.jit
    def forward_n(params, input_ids, attention_mask):
        def body(carry, _):
            probs = model.apply(params, input_ids, attention_mask).probs
            return carry + jnp.sum(probs), None
        total, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_iters)
        return total

    np.asarray(forward_n(params, input_ids, attention_mask))  # compile+warmup

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(forward_n(params, input_ids, attention_mask))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pairs_per_sec = (B * n_iters) / dt
    result = {
        "metric": "roberta_large_one_tower_inference",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / 10000.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
