"""Pallas attention kernel microbenchmark: fwd / bwd wall-clock and
effective TFLOP/s vs the kernel flop counts (fwd 4·B·N·S²·H, bwd 10·…),
for the flagship shape (S=512, N=16, H=64, bf16) and optionally the
blocked S>512 path.

Run manually: ``python benchmarks/bench_attention.py [--batch 16]
[--seq 512] [--dropout] [--blockwise]``.
"""

import argparse
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync (tunnel-safe)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None or dt < best else best
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--head_dim", type=int, default=64)
    p.add_argument("--dropout", action="store_true")
    p.add_argument("--blockwise", action="store_true")
    p.add_argument("--block", type=int, default=256)
    args = p.parse_args()

    from item_alignment_tpu.ops.attention import make_attention_bias
    from item_alignment_tpu.ops import pallas_attention as pa

    B, S, N, H = args.batch, args.seq, args.heads, args.head_dim
    rng = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(r, (B, S, N, H), jnp.bfloat16)
               for r in jax.random.split(rng, 3))
    mask = np.ones((B, S), np.int32)
    mask[:, -32:] = 0
    bias = make_attention_bias(jnp.asarray(mask))
    unit = B * N * S * S * H

    if args.blockwise:
        if args.dropout:
            fwd = jax.jit(lambda q, k, v: pa.fused_attention_blockwise_dropout(
                0.1, jnp.int32(3), q, k, v, bias, args.block, args.block))
        else:
            fwd = jax.jit(lambda q, k, v: pa.fused_attention_blockwise(
                q, k, v, bias, args.block, args.block))
        name = "blockwise"
    elif args.dropout:
        fwd = jax.jit(lambda q, k, v: pa.fused_attention_dropout(
            0.1, jnp.int32(3), q, k, v, bias))
        name = "full_tile_dropout"
    else:
        fwd = jax.jit(lambda q, k, v: pa.fused_attention(q, k, v, bias))
        name = "full_tile"

    grad = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        fwd(q, k, v).astype(jnp.float32)), argnums=(0, 1, 2)))

    t_fwd = timed(fwd, q, k, v)
    t_full = timed(grad, q, k, v)
    fwd_tf = 4 * unit / t_fwd / 1e12
    # grad runs fwd (custom_vjp fwd) + bwd kernels
    t_bwd = t_full - t_fwd
    bwd_tf = 10 * unit / max(t_bwd, 1e-9) / 1e12
    print(json.dumps({
        "metric": f"pallas_attention_{name}",
        "batch": B, "seq": S, "heads": N, "head_dim": H,
        "fwd_ms": round(t_fwd * 1e3, 2),
        "fwd_tflops": round(fwd_tf, 1),
        "fwd_mxu_frac": round(fwd_tf / 197, 3),
        "fwd_plus_bwd_ms": round(t_full * 1e3, 2),
        "bwd_ms_est": round(t_bwd * 1e3, 2),
        "bwd_tflops": round(bwd_tf, 1),
        "bwd_mxu_frac": round(bwd_tf / 197, 3),
    }))


if __name__ == "__main__":
    main()
