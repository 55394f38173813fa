"""Flagship RoBERTa-large one-tower cross-encoder inference benchmark
throughput (item-pairs/sec/chip) on real TPU hardware, bf16 + Pallas fused
attention.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 10_000 — the BASELINE.json north-star of
>=10k pairs/sec/chip (defined for the cached two-tower path; the
cross-encoder necessarily re-encodes every pair, ~334 GFLOP each, so its
ceiling on a ~200 TFLOP/s bf16 chip is ~590 pairs/s at 100% MFU).  The
reference never measured throughput; its train run took ~58h on an 80GB
GPU (README.md:443-444).

Methodology: n_iters forwards inside one jit via lax.scan over
PER-ITERATION inputs (loop-invariant bodies get hoisted by XLA and
over-report 10x), one host transfer closes the timing;
``block_until_ready`` is unreliable through the remote-TPU tunnel.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    p = argparse.ArgumentParser()
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="int8 MXU path for the dense projections "
                        "(ops/quant.py; v5e int8 peak is 2x bf16)")
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args()

    cfg = ModelConfig.roberta_large(
        max_seq_len=50, max_seq_len_pv=205, dtype="bfloat16",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        use_flash_attention=True, quant=args.quant)
    model = RobertaOneTower(cfg)
    # batch sweep on v5e: 32 -> 341.9, 64 -> 377.8, 128 -> 354.9 pairs/s;
    # 64 is the throughput sweet spot
    B, S, n_iters = args.batch_size, cfg.pair_seq_len, 4

    rng = jax.random.PRNGKey(0)
    input_ids = jax.random.randint(rng, (n_iters, B, S), 1, cfg.vocab_size,
                                   dtype=jnp.int32)
    attention_mask = jnp.ones((n_iters, B, S), jnp.int32)
    params = jax.jit(model.init)({"params": rng}, input_ids[0],
                                 attention_mask[0])
    # bf16 weights: HBM reads at full rate; probs still come back fp32
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    @jax.jit
    def forward_n(params, ids, masks):
        def body(carry, xm):
            x, m = xm
            return carry + jnp.sum(model.apply(params, x, m).probs), None
        total, _ = jax.lax.scan(body, jnp.float32(0), (ids, masks))
        return total

    np.asarray(forward_n(params, input_ids, attention_mask))  # compile

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(forward_n(params, input_ids, attention_mask))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pairs_per_sec = (B * n_iters) / dt
    # FLOP decomposition per pair: matmuls 2*S*(4H^2 + 2H*I) per layer,
    # attention 4*S^2*H per layer.  The "identity-attention bound"
    # (~440 pairs/s) removes ALL attention work; the attention kernel
    # itself runs near the hardware roofline — its QK^T/PV matmuls have a
    # 64-deep contraction (head_dim), which caps the MXU at ~50% for that
    # ~8% slice of the FLOPs, plus ~133M softmax exps per layer per batch
    # on the VPU.
    H, I, L, S = (cfg.hidden_size, cfg.intermediate_size,
                  cfg.num_hidden_layers, cfg.pair_seq_len)
    matmul_flops = L * 2 * S * (4 * H * H + 2 * H * I)
    attn_flops = L * 4 * S * S * H
    total = (matmul_flops + attn_flops) * pairs_per_sec
    result = {
        "metric": "roberta_large_one_tower_inference"
                  + (f"_{args.quant}" if args.quant else ""),
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / 10000.0, 4),
        "achieved_tflops": round(total / 1e12, 1),
        "attention_tflops": round(attn_flops * pairs_per_sec / 1e12, 2),
        "mfu_vs_197tflops_bf16": round(total / 197e12, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
