"""Two-tower serving benchmark: embedding-cache pair scoring on one chip.

The BASELINE.json north-star (>=10k item-pairs/sec/chip two-tower
inference) is defined for the serving path where each unique item is
encoded once and pairs are scored against the cache
(``engine/inference.py``).  This measures both stages:

1. item encoding throughput (RoBERTa-large two-tower item, 256 tokens)
2. cached pair-scoring throughput (gather + head matmul)

Run manually: ``python benchmarks/bench_two_tower.py``.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import argparse

    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaBackbone

    p = argparse.ArgumentParser()
    p.add_argument("--quant", default=None, choices=["int8"])
    p.add_argument("--batch_size", type=int, default=64,
                   help="encode batch; the 255-token tower may sit better "
                        "on the MXU at 128/256 than the cross-encoder's "
                        "510-token bs-64 sweet spot")
    args = p.parse_args()

    cfg = ModelConfig.roberta_large(
        max_seq_len=50, max_seq_len_pv=205, dtype="bfloat16",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        quant=args.quant)
    backbone = RobertaBackbone(cfg)
    S = cfg.item_seq_len  # 255 tokens per item in the two-tower layout
    B, iters = args.batch_size, max(1, 256 // args.batch_size)

    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (iters, B, S), 1, cfg.vocab_size, jnp.int32)
    mask = jnp.ones((iters, B, S), jnp.int32)
    params = jax.jit(backbone.init)({"params": rng}, ids[0], mask[0])
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    @jax.jit
    def encode_n(p, ids, masks):
        def body(c, xm):
            x, m = xm
            return c + jnp.sum(backbone.apply(p, x, m)[-1][:, 0]), None
        return jax.lax.scan(body, jnp.float32(0), (ids, masks))[0]

    np.asarray(encode_n(params, ids, mask))
    t0 = time.perf_counter()
    np.asarray(encode_n(params, ids, mask))
    enc_dt = time.perf_counter() - t0
    items_per_sec = B * iters / enc_dt

    # ---- cached pair scoring
    H = cfg.hidden_size
    n_items, n_pairs = 100_000, 1_000_000
    cache = jax.random.normal(rng, (n_items, H), jnp.bfloat16)
    head_w = jax.random.normal(rng, (2 * H, 2), jnp.bfloat16)
    head_b = jnp.zeros(2, jnp.bfloat16)
    src = jax.random.randint(rng, (n_pairs,), 0, n_items, jnp.int32)
    tgt = jax.random.randint(rng, (n_pairs,), 0, n_items, jnp.int32)

    @jax.jit
    def score_all(cache, src, tgt):
        se = jnp.take(cache, src, axis=0)
        te = jnp.take(cache, tgt, axis=0)
        logits = (jnp.concatenate((se, te), -1) @ head_w + head_b)
        return jnp.sum(jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1])

    np.asarray(score_all(cache, src, tgt))
    t0 = time.perf_counter()
    np.asarray(score_all(cache, src, tgt))
    score_dt = time.perf_counter() - t0
    pairs_per_sec = n_pairs / score_dt

    print(json.dumps({
        "encode_batch": B,
        "item_encode_per_sec": round(items_per_sec, 1),
        "cached_pair_score_per_sec": round(pairs_per_sec, 1),
        "note": "north-star >=10k pairs/s holds when pair lists reuse "
                "cached items (mining); unique-item pairs are bounded by "
                "2x item encoding",
    }))


if __name__ == "__main__":
    main()
