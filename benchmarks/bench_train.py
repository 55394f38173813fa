"""Training-step throughput for the flagship RoBERTa-large one-tower
cross-encoder (fwd+bwd+AdamW) on one chip, bf16 compute / fp32 params.

Context: the reference's full 8-model `train.sh` took ~58h on an 80GB GPU
(README.md:443-444); its flagship config is bs 40, seq 50+205, 10 epochs
over ~65k pairs (~16k steps).  At the rate printed here you can estimate
the single-chip wall-clock for the same run.

Run manually: ``python benchmarks/bench_train.py [--remat]``.
"""

import argparse
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_policy", default="dots",
                   choices=["dots", "full", "mlp"])
    p.add_argument("--opt", default="fused", choices=["fused", "optax"],
                   help="fused single-pass AdamW (engine.optim.fused_adamw) "
                        "vs plain optax.adamw")
    p.add_argument("--opt_state_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype for AdamW moments: bf16 cuts the "
                        "optimizer pass's HBM bytes ~43%% and frees 1.4GB "
                        "on the flagship (fp32 arithmetic either way)")
    p.add_argument("--fuse_qkv", action="store_true",
                   help="one [H, 3H] q/k/v projection matmul per layer")
    p.add_argument("--no_dropout", action="store_true",
                   help="zero both dropout rates: isolates the cost of the "
                        "dropout masks (rbg hidden-dropout streams + the "
                        "in-kernel attention-dropout draws) in the train step")
    p.add_argument("--breakdown", action="store_true",
                   help="also time fwd-only and fwd+bwd-only scans to report "
                        "the fwd/bwd/opt cost split")
    args = p.parse_args()

    from item_alignment_tpu.config import ModelConfig, OptimizerConfig
    from item_alignment_tpu.engine.optim import make_optimizer
    from item_alignment_tpu.models.text import RobertaOneTower

    drop = 0.0 if args.no_dropout else 0.1
    cfg = ModelConfig.roberta_large(
        max_seq_len=50, max_seq_len_pv=205, dtype="bfloat16",
        hidden_dropout_prob=drop, attention_probs_dropout_prob=drop,
        remat=args.remat, remat_policy=args.remat_policy,
        fuse_qkv=args.fuse_qkv)
    model = RobertaOneTower(cfg)
    B, S, iters = args.batch_size, cfg.pair_seq_len, 4

    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (iters, B, S), 1, cfg.vocab_size, jnp.int32)
    mask = jnp.ones((iters, B, S), jnp.int32)
    labels = jnp.zeros((iters, B), jnp.int32)
    params = jax.jit(model.init)({"params": rng, "dropout": rng},
                                 ids[0], mask[0], labels=labels[0])["params"]
    ocfg = OptimizerConfig(learning_rate=5e-5, total_steps=16000,
                           fused=(args.opt == "fused"),
                           state_dtype=args.opt_state_dtype)
    tx = make_optimizer(ocfg, params)
    opt_state = tx.init(params)

    def loss_fn(p, x, m, l):
        # rbg dropout key: matches the Trainer (threefry bit-gen costs
        # ~30% of the step; rbg uses the hardware RNG)
        return model.apply(
            {"params": p}, x, m, labels=l, deterministic=False,
            rngs={"dropout": jax.random.key(0, impl="rbg")}).loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_n(params, opt_state, ids, masks, labels):
        def body(carry, xml):
            p, o = carry
            x, m, l = xml
            loss, g = jax.value_and_grad(loss_fn)(p, x, m, l)
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (ids, masks, labels))
        return params, opt_state, losses[-1]

    def sync(out):
        # host-copy one leaf: block_until_ready alone does not fence the
        # remote-backend tunnel
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    def timed(fn, *fn_args):
        out = fn(*fn_args)  # compile
        sync(out)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            sync(fn(*fn_args))
            times.append(time.perf_counter() - t0)
        return min(times), out

    dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = train_n(params, opt_state, ids, mask, labels)
        np.asarray(loss)
        t = time.perf_counter() - t0
        dt = t if dt is None or t < dt else dt

    breakdown = {}
    if args.breakdown:
        # the full step was timed above; free the optimizer state (fp32 m+v,
        # ~2.8GB for the flagship) before compiling the fwd/grad-only probes
        # — keeping all three programs' buffers live OOMed the 16GB chip at
        # batch 32
        del opt_state
        jax.clear_caches()

        @jax.jit
        def fwd_n(params, ids, masks, labels):
            def body(acc, xml):
                x, m, l = xml
                return acc + loss_fn(params, x, m, l), None
            return jax.lax.scan(body, 0.0, (ids, masks, labels))[0]

        @jax.jit
        def grad_n(params, ids, masks, labels):
            def body(acc, xml):
                x, m, l = xml
                loss, g = jax.value_and_grad(loss_fn)(params, x, m, l)
                return jax.tree.map(lambda a, b: a + b, acc, g), loss
            zeros = jax.tree.map(jnp.zeros_like, params)
            acc, losses = jax.lax.scan(body, zeros, (ids, masks, labels))
            # consume EVERY grad leaf as a real output: XLA prunes the
            # backward of any parameter whose grad is unused (a discarded
            # carry, a 0.0-scaled probe, or a partial sum all get DCE'd)
            probe = sum(jnp.sum(leaf if leaf.ndim == 0 else leaf[..., 0])
                        for leaf in jax.tree_util.tree_leaves(acc))
            return losses[-1], probe

        t_fwd, _ = timed(fwd_n, params, ids, mask, labels)
        t_grad, _ = timed(grad_n, params, ids, mask, labels)
        breakdown = {
            "fwd_ms": round(t_fwd / iters * 1000, 1),
            "bwd_ms": round((t_grad - t_fwd) / iters * 1000, 1),
        }
        breakdown["opt_ms"] = round(
            dt / iters * 1000 - breakdown["fwd_ms"] - breakdown["bwd_ms"], 1)
    pairs_per_sec = B * iters / dt
    # model FLOPs (fwd): per layer 2*S*(4H^2 qkvo + 2H*I mlp) matmul MACs*2
    # + attention 2*2*S^2*H; train step = fwd + 2x bwd = 3x fwd (no remat
    # overhead counted — MFU is utilization of *useful* FLOPs)
    H, I, L, S2 = (cfg.hidden_size, cfg.intermediate_size,
                   cfg.num_hidden_layers, cfg.pair_seq_len)
    fwd_flops = L * (2 * S2 * (4 * H * H + 2 * H * I) + 4 * S2 * S2 * H)
    step_flops = 3 * fwd_flops * B
    v5e_peak = 197e12  # bf16 TFLOPs, TPU v5e
    mfu = step_flops / (dt / iters) / v5e_peak
    print(json.dumps({
        "metric": "roberta_large_one_tower_train",
        "pairs_per_sec": round(pairs_per_sec, 1),
        "ms_per_step": round(dt / iters * 1000, 1),
        "model_tflops_per_step": round(step_flops / 1e12, 2),
        "mfu": round(mfu, 3),
        "batch_size": B,
        "remat": args.remat, "fuse_qkv": args.fuse_qkv,
        "no_dropout": args.no_dropout,
        "remat_policy": args.remat_policy if args.remat else None,
        "opt": args.opt, "opt_state_dtype": args.opt_state_dtype,
        # ~65k train pairs x 10 epochs at this batch size
        "flagship_10epoch_est_hours": round(
            (650_000 / B) * (dt / iters) / 3600, 2),
        **breakdown,
    }))


if __name__ == "__main__":
    main()
