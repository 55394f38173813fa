"""Image preprocessing parity-ish checks + embedding-cache inference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from item_alignment_tpu.data import images as I
from item_alignment_tpu.engine.inference import TwoTowerInference


def _img(h=100, w=80, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)


def test_eval_transform_shape_and_range():
    out = I.eval_transform(_img(), 64, crop_pct=0.875)
    assert out.shape == (64, 64, 3)
    # normalized: roughly zero-centered
    assert -3 < out.mean() < 3


def test_train_transform_deterministic_with_seed():
    rng1 = np.random.RandomState(7)
    rng2 = np.random.RandomState(7)
    a = I.train_transform(_img(), 32, rng=rng1)
    b = I.train_transform(_img(), 32, rng=rng2)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 32, 3)


def test_device_resize_normalize_matches_host_stats():
    imgs = np.stack([_img(64, 64, s) for s in range(2)])
    out = np.asarray(jax.jit(
        lambda x: I.device_resize_normalize(x, 32))(jnp.array(imgs)))
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()


def test_load_image_broken_returns_none(tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"not an image")
    assert I.load_image(str(p)) is None


def test_image_shards_roundtrip(tmp_path):
    pairs = [(f"p{i}", _img(8, 8, i), _img(8, 8, i + 10), i % 2)
             for i in range(5)]
    paths = I.write_image_shards(pairs, str(tmp_path), shard_size=2)
    assert len(paths) == 3
    back = list(I.read_image_shards(paths))
    total = sum(len(b["labels"]) for b in back)
    assert total == 5
    np.testing.assert_array_equal(back[0]["images_1"][0], pairs[0][1])


def test_dump_image_embeddings(tmp_path):
    ids = ["a", "b"]
    img_paths = []
    from PIL import Image
    for i, iid in enumerate(ids):
        p = tmp_path / f"{iid}.png"
        Image.fromarray(_img(40, 40, i)).save(p)
        img_paths.append(str(p))

    def encode(batch):
        return batch.mean(axis=(1, 2))  # fake 3-dim embedding

    out = I.dump_image_embeddings(ids, img_paths, encode,
                                  str(tmp_path / "emb.json"), image_size=16)
    assert set(out) == {"a", "b"}
    assert len(out["a"]) == 3


# ------------------------------------------------- embedding-cache serving
def test_two_tower_inference_cache_matches_direct():
    H = 8
    rs = np.random.RandomState(0)
    W = rs.randn(2 * H, 2).astype(np.float32)
    b = rs.randn(2).astype(np.float32)
    proj = rs.randn(4, H).astype(np.float32)
    params = {"params": {"classifier": {"out_proj": {"kernel": W, "bias": b}},
                         "proj": proj}}

    def encode_fn(params, batch):
        return batch["x"] @ params["params"]["proj"]

    def head_fn(params, se, te):
        head = params["params"]["classifier"]["out_proj"]
        logits = jnp.concatenate((se, te), -1) @ head["kernel"] + head["bias"]
        return jax.nn.softmax(logits, -1)[:, 1]

    inf = TwoTowerInference(params, encode_fn, head_fn, batch_size=4)
    n_items = 10
    feats = rs.randn(n_items, 4).astype(np.float32)
    ids = [f"i{k}" for k in range(n_items)]
    inf.build_cache(ids, [{"x": jnp.array(feats[:6])},
                          {"x": jnp.array(feats[6:])}])
    pairs = [("i0", "i3"), ("i2", "i9"), ("i5", "i5")]
    probs = inf.score_pairs_by_id(pairs)
    # direct computation
    emb = feats @ proj
    for (a, bb), p in zip(pairs, probs):
        se, te = emb[int(a[1:])], emb[int(bb[1:])]
        logits = np.concatenate([se, te]) @ W + b
        expect = np.exp(logits[1]) / np.exp(logits).sum()
        assert abs(p - expect) < 1e-5
