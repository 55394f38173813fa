"""Multi-chip mining benchmark: the bench.py workload sharded over a
``(data,)`` mesh with pjit.

Runs on however many devices are visible — one real chip today, a v5e-8
when available, or a CPU simulation via
``JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8``.
Item encoding shards the batch across the data axis (params replicated);
cached pair scoring shards the pair list.  Throughput should scale ~linearly
in chips because both stages are embarrassingly data-parallel.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items_per_chip", type=int, default=1024)
    ap.add_argument("--pairs_per_item", type=int, default=100)
    ap.add_argument("--batch_per_chip", type=int, default=64)
    ap.add_argument("--tiny_model", action="store_true",
                    help="small encoder for CPU-simulation validation")
    args = ap.parse_args()
    N_ITEMS_PER_CHIP = args.items_per_chip
    PAIRS_PER_ITEM = args.pairs_per_item
    from item_alignment_tpu.config import MeshConfig, ModelConfig
    from item_alignment_tpu.models.text import RobertaBackbone
    from item_alignment_tpu.parallel.mesh import create_mesh

    n_dev = jax.device_count()
    mesh = create_mesh(MeshConfig(data=n_dev, fsdp=1, tensor=1))
    n_items = N_ITEMS_PER_CHIP * n_dev

    if args.tiny_model:
        cfg = ModelConfig(hidden_size=64, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=128,
                          max_seq_len=8, max_seq_len_pv=8,
                          max_position_embeddings=64, dtype="bfloat16",
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    else:
        cfg = ModelConfig.roberta_large(
            max_seq_len=50, max_seq_len_pv=205, dtype="bfloat16",
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    backbone = RobertaBackbone(cfg)
    S, H = cfg.item_seq_len, cfg.hidden_size
    B = args.batch_per_chip * n_dev
    n_batches = n_items // B

    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (n_batches, B, S), 1, cfg.vocab_size,
                             jnp.int32)
    mask = jnp.ones((n_batches, B, S), jnp.int32)
    params = jax.jit(backbone.init)({"params": rng}, ids[0], mask[0])
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    replicated = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P(None, "data"))
    params = jax.device_put(params, replicated)
    ids = jax.device_put(ids, batch_shard)
    mask = jax.device_put(mask, batch_shard)

    @jax.jit
    def encode_all(p, ids, masks):
        def body(_, xm):
            x, m = xm
            return 0, backbone.apply(p, x, m)[-1][:, 0]
        return jax.lax.scan(body, 0, (ids, masks))[1].reshape(-1, H)

    n_pairs = n_items * PAIRS_PER_ITEM
    pair_shard = NamedSharding(mesh, P("data"))
    src = jax.device_put(
        jax.random.randint(rng, (n_pairs,), 0, n_items, jnp.int32), pair_shard)
    tgt = jax.device_put(
        jax.random.randint(rng, (n_pairs,), 0, n_items, jnp.int32), pair_shard)
    head_w = jax.device_put(
        jax.random.normal(rng, (2 * H, 2), jnp.bfloat16), replicated)

    @jax.jit
    def score_all(cache, src, tgt):
        se = jnp.take(cache, src, axis=0)
        te = jnp.take(cache, tgt, axis=0)
        logits = jnp.concatenate((se, te), -1) @ head_w
        return jnp.sum(jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1])

    cache = encode_all(params, ids, mask)
    np.asarray(score_all(cache, src, tgt))

    t0 = time.perf_counter()
    cache = encode_all(params, ids, mask)
    np.asarray(score_all(cache, src, tgt))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "two_tower_mining_throughput_multichip",
        "n_devices": n_dev,
        "pairs_per_sec": round(n_pairs / dt, 1),
        "pairs_per_sec_per_chip": round(n_pairs / dt / n_dev, 1),
    }))


if __name__ == "__main__":
    main()
