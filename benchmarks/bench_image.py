"""Image-tower throughput on one TPU chip: the SURVEY.md "hard parts"
NFNet case (ScaledStdConv/ECA at the reference's large input sizes,
finetune_image.py image_size 1000 / our train.sh 800) plus ViT-384 and
ResNetV2, forward (serving) and train-step (pair finetune).

Run manually: ``python benchmarks/bench_image.py [--model eca_nfnet_l0]
[--image_size 800] [--train]``.  Prints one JSON line.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="eca_nfnet_l0",
                   choices=["eca_nfnet_l0", "vit_base_patch16_384",
                            "resnetv2_50"])
    p.add_argument("--image_size", type=int, default=None,
                   help="defaults: nfnet 800, vit 384, resnet 448")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--train", action="store_true",
                   help="pair two-tower train step instead of forward")
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="int8 MXU path for the ViT MLP denses (inference)")
    args = p.parse_args()

    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.image import ImageTwoTower

    defaults = {"eca_nfnet_l0": (800, 8), "vit_base_patch16_384": (384, 16),
                "resnetv2_50": (448, 16)}
    size, bs = defaults[args.model]
    size = args.image_size or size
    B = args.batch_size or bs

    cfg = ModelConfig(model_name=args.model, image_model_name=args.model,
                      image_size=size, interaction_type="two_tower",
                      dtype="bfloat16", hidden_dropout_prob=0.0,
                      quant=args.quant)
    model = ImageTwoTower(cfg)
    n_iters = 4
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (n_iters, B, size, size, 3), jnp.float32)
    labels = jnp.zeros((n_iters, B), jnp.int32)
    params = jax.jit(model.init)(
        {"params": rng}, imgs[0, :, :, :, :], imgs[0, :, :, :, :],
        labels=labels[0])

    v5e_peak = 197e12  # bf16 TFLOP/s

    def compiled_flops(compiled):
        """XLA's own FLOP count for the compiled executable (covers convs
        exactly — no hand formula for grouped/strided convs needed)."""
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0)) or None
        except Exception:
            return None

    if not args.train:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

        def forward_n(p, imgs):
            def body(c, x):
                return c + jnp.sum(model.apply(p, x, x).probs), None
            total, _ = jax.lax.scan(body, jnp.float32(0), imgs)
            return total

        fwd = jax.jit(forward_n).lower(params, imgs).compile()
        flops = compiled_flops(fwd)
        np.asarray(fwd(params, imgs))
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fwd(params, imgs))
            times.append(time.perf_counter() - t0)
        out = {
            "metric": f"{args.model}_two_tower_forward",
            "image_size": size, "batch_size": B,
            "pairs_per_sec": round(B * n_iters / min(times), 1)}
        if flops:
            out["tflops_total"] = round(flops / 1e12, 2)
            out["mfu"] = round(flops / min(times) / v5e_peak, 3)
        print(json.dumps(out))
        return

    import optax

    tx = optax.adamw(1e-4)
    opt = tx.init(params)

    def train_n(params, opt, imgs, labels):
        def body(carry, xl):
            p, o = carry
            x, l = xl

            def loss_fn(p):
                return model.apply(p, x, x, labels=l,
                                   deterministic=False,
                                   rngs={"dropout": jax.random.key(
                                       0, impl="rbg")}).loss

            loss, g = jax.value_and_grad(loss_fn)(p)
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), loss

        (params, opt), losses = jax.lax.scan(body, (params, opt),
                                             (imgs, labels))
        return losses[-1]

    step = jax.jit(train_n).lower(params, opt, imgs, labels).compile()
    flops = compiled_flops(step)
    np.asarray(step(params, opt, imgs, labels))
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(step(params, opt, imgs, labels))
        times.append(time.perf_counter() - t0)
    out = {
        "metric": f"{args.model}_two_tower_train",
        "image_size": size, "batch_size": B,
        "pairs_per_sec": round(B * n_iters / min(times), 1),
        "ms_per_step": round(min(times) / n_iters * 1000, 1)}
    if flops:
        out["tflops_total"] = round(flops / 1e12, 2)
        out["mfu"] = round(flops / min(times) / v5e_peak, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
