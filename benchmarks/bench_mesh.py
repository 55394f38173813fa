"""Mesh-layout wall-clock comparison (VERDICT r3 #8, second half).

Times the SAME global-batch train step (fwd+bwd+AdamW) under different
(data, fsdp, tensor) mesh layouts so the partition rules' collective
overheads are visible side by side.  Runs on whatever devices exist; with
one real chip it forces the standard 8-device CPU mesh (the same recipe
the sharding tests use), which exposes RELATIVE overheads — collective
count and placement — not absolute TPU step times.

Run: ``python benchmarks/bench_mesh.py [--hidden 256 --layers 4 ...]``.
Prints one JSON line with ms/step per layout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__" and os.environ.get("IA_MESH_REAL") != "1":
    # single-chip default: simulate 8 devices on CPU (set IA_MESH_REAL=1
    # to run on the real device topology instead)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

if __name__ == "__main__" and os.environ.get("IA_MESH_REAL") != "1":
    jax.config.update("jax_platforms", "cpu")


LAYOUTS = [(8, 1, 1), (1, 8, 1), (2, 2, 2), (4, 1, 2), (1, 1, 1)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--seq", type=int, default=128)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import optax

    from item_alignment_tpu.config import (
        MeshConfig, ModelConfig, OptimizerConfig,
    )
    from item_alignment_tpu.engine.optim import make_optimizer
    from item_alignment_tpu.models.text import RobertaOneTower
    from item_alignment_tpu.parallel.mesh import create_mesh
    from item_alignment_tpu.parallel.sharding import (
        batch_sharding, shard_params, tree_shardings,
    )

    cfg = ModelConfig(hidden_size=args.hidden, num_hidden_layers=args.layers,
                      num_attention_heads=args.heads,
                      intermediate_size=4 * args.hidden, vocab_size=1024,
                      max_seq_len=args.seq // 2 - 1,
                      max_seq_len_pv=0,
                      max_position_embeddings=args.seq + 8,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    model = RobertaOneTower(cfg)
    B, S = args.batch, cfg.pair_seq_len
    rs = np.random.RandomState(0)
    ids = rs.randint(3, 1000, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    labels = (np.arange(B) % 2).astype(np.int32)
    params0 = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                  jnp.asarray(ids), jnp.asarray(mask),
                                  labels=jnp.asarray(labels))["params"]

    def loss_fn(p, i, m, l):
        return model.apply({"params": p}, i, m, labels=l).loss

    rows = {}
    n_dev = jax.device_count()
    for (d, f, t) in LAYOUTS:
        if d * f * t > n_dev:
            continue
        mesh = create_mesh(MeshConfig(data=d, fsdp=f, tensor=t))
        params = shard_params(params0, mesh)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-4,
                                            total_steps=1000, fused=True),
                            params)
        opt_state = jax.device_put(tx.init(params),
                                   tree_shardings(tx.init(params), mesh))
        bsh = batch_sharding(mesh)
        di = jax.device_put(jnp.asarray(ids), bsh)
        dm = jax.device_put(jnp.asarray(mask), bsh)
        dl = jax.device_put(jnp.asarray(labels), bsh)

        with mesh:
            @jax.jit
            def step(p, o, i, m, l):
                loss, g = jax.value_and_grad(loss_fn)(p, i, m, l)
                u, o = tx.update(g, o, p)
                return optax.apply_updates(p, u), o, loss

            params, opt_state, loss = step(params, opt_state, di, dm, dl)
            np.asarray(loss)  # compile + first step
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                params, opt_state, loss = step(params, opt_state, di, dm, dl)
                np.asarray(loss)
                times.append(time.perf_counter() - t0)
        rows[f"data{d}_fsdp{f}_tp{t}"] = round(min(times) * 1e3, 2)
        del params, opt_state

    print(json.dumps({
        "metric": "mesh_layout_step_ms",
        "devices": n_dev,
        "platform": jax.devices()[0].platform,
        "global_batch": B, "seq": S,
        "hidden": args.hidden, "layers": args.layers,
        "ms_per_step": rows,
    }))


if __name__ == "__main__":
    import optax  # noqa: F401  (imported lazily above; fail fast here)
    main()
