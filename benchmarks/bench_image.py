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
    # distinct src/tgt images: feeding the same array to both towers lets
    # XLA CSE the second tower away entirely, halving the real work behind
    # an unchanged "pairs/s" (this bench's earlier rows did exactly that)
    imgs = jax.random.normal(rng, (n_iters, B, size, size, 3), jnp.float32)
    imgs2 = jax.random.normal(jax.random.PRNGKey(1),
                              (n_iters, B, size, size, 3), jnp.float32)
    labels = jnp.zeros((n_iters, B), jnp.int32)
    params = jax.jit(model.init)(
        {"params": rng}, imgs[0, :, :, :, :], imgs2[0, :, :, :, :],
        labels=labels[0])

    v5e_peak = 197e12  # bf16 TFLOP/s

    def traced_flops(fn, *fargs):
        """Exact dot/conv FLOPs from the traced jaxpr (the remote backend's
        compiled.cost_analysis() under-reports; see utils/flops.py)."""
        from item_alignment_tpu.utils.flops import count_flops
        try:
            return count_flops(fn, *fargs)
        except Exception:
            return None

    if not args.train:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

        def forward_n(p, imgs, imgs2):
            def body(c, xs):
                x, x2 = xs
                return c + jnp.sum(model.apply(p, x, x2).probs), None
            total, _ = jax.lax.scan(body, jnp.float32(0), (imgs, imgs2))
            return total

        fwd = jax.jit(forward_n).lower(params, imgs, imgs2).compile()
        flops = traced_flops(forward_n, params, imgs, imgs2)
        np.asarray(fwd(params, imgs, imgs2))
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fwd(params, imgs, imgs2))
            times.append(time.perf_counter() - t0)
        out = {
            "metric": f"{args.model}_two_tower_forward",
            "image_size": size, "batch_size": B,
            "pairs_per_sec": round(B * n_iters / min(times), 1)}
        if flops:
            out["gflops_per_pair"] = round(flops / (B * n_iters) / 1e9, 1)
            out["tflops_per_sec"] = round(flops / min(times) / 1e12, 1)
            out["mfu"] = round(flops / min(times) / v5e_peak, 3)
        print(json.dumps(out))
        return

    import optax

    tx = optax.adamw(1e-4)
    opt = tx.init(params)

    def train_n(params, opt, imgs, imgs2, labels):
        def body(carry, xl):
            p, o = carry
            x, x2, l = xl

            def loss_fn(p):
                return model.apply(p, x, x2, labels=l,
                                   deterministic=False,
                                   rngs={"dropout": jax.random.key(
                                       0, impl="rbg")}).loss

            loss, g = jax.value_and_grad(loss_fn)(p)
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), loss

        (params, opt), losses = jax.lax.scan(body, (params, opt),
                                             (imgs, imgs2, labels))
        return losses[-1]

    step = jax.jit(train_n).lower(params, opt, imgs, imgs2, labels).compile()
    flops = traced_flops(train_n, params, opt, imgs, imgs2, labels)
    np.asarray(step(params, opt, imgs, imgs2, labels))
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(step(params, opt, imgs, imgs2, labels))
        times.append(time.perf_counter() - t0)
    out = {
        "metric": f"{args.model}_two_tower_train",
        "image_size": size, "batch_size": B,
        "pairs_per_sec": round(B * n_iters / min(times), 1),
        "ms_per_step": round(min(times) / n_iters * 1000, 1)}
    if flops:
        out["gflops_per_pair"] = round(flops / (B * n_iters) / 1e9, 1)
        out["tflops_per_sec"] = round(flops / min(times) / 1e12, 1)
        out["mfu"] = round(flops / min(times) / v5e_peak, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
