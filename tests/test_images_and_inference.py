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
    # values are the canonical comma-joined ASCII embedding text
    assert len(out["a"].split(",")) == 3
    # the JSON on disk parses back to the same fp32 values
    import json
    loaded = json.loads((tmp_path / "emb.json").read_text(encoding="utf-8"))
    np.testing.assert_array_equal(
        np.array(loaded["a"], np.float32),
        np.array([np.float32(v) for v in out["a"].split(",")]))


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


def test_two_tower_inference_int8_cache_tracks_fp32():
    """cache_quant='int8' halves cache HBM + gather bandwidth; per-row
    symmetric quantization must keep the scored probabilities within a
    small perturbation of the fp32 cache."""
    H = 8
    rs = np.random.RandomState(1)
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

    n_items = 12
    feats = rs.randn(n_items, 4).astype(np.float32)
    ids = [f"i{k}" for k in range(n_items)]
    batches = [{"x": jnp.array(feats[:6])}, {"x": jnp.array(feats[6:])}]
    pairs = [("i0", "i3"), ("i2", "i9"), ("i5", "i5"), ("i7", "i1")]

    fp = TwoTowerInference(params, encode_fn, head_fn, batch_size=4)
    fp.build_cache(ids, batches)
    q = TwoTowerInference(params, encode_fn, head_fn, batch_size=4,
                          cache_quant="int8")
    cache = q.build_cache(ids, batches)
    assert cache.dtype == jnp.int8 and q.cache_scale is not None
    np.testing.assert_allclose(q.score_pairs_by_id(pairs),
                               fp.score_pairs_by_id(pairs), atol=0.01)


def test_saliency_box_proposal_finds_product_on_plain_background():
    """propose_box_saliency (offline YOLO fallback): a product on a studio
    background yields its bounding box; a full-noise photo yields none."""
    from item_alignment_tpu.data.images import (
        SALIENCY_CLASS, crop_largest_detection, propose_box_saliency,
    )

    img = np.full((200, 300, 3), 245, np.uint8)  # near-white background
    img[40:160, 90:210] = [180, 30, 30]          # the product
    (x1, y1, x2, y2, cls, conf), = propose_box_saliency(img)
    assert cls == SALIENCY_CLASS
    assert abs(x1 - 90) <= 2 and abs(x2 - 210) <= 2
    assert abs(y1 - 40) <= 2 and abs(y2 - 160) <= 2
    cropped = crop_largest_detection(img, propose_box_saliency(img))
    assert cropped.shape[0] <= 122 and cropped.shape[1] <= 122

    busy = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    assert propose_box_saliency(busy) == []


def test_crop_images_with_boxes_saliency_detector(tmp_path):
    """The crop pass uses the fallback detector for items without
    precomputed boxes, gated on CATE2YOLO_CLASS category membership."""
    import json

    from PIL import Image

    from item_alignment_tpu.data.images import (
        CATE2YOLO_CLASS, crop_images_with_boxes, propose_box_saliency,
    )

    cate = next(iter(CATE2YOLO_CLASS))
    images = tmp_path / "imgs"
    images.mkdir()
    img = np.full((100, 100, 3), 250, np.uint8)
    img[20:80, 30:90] = 60
    Image.fromarray(img).save(images / "a.jpg")
    Image.fromarray(img).save(images / "b.jpg")
    info = tmp_path / "item_info.jsonl"
    with open(info, "w", encoding="utf-8") as w:
        w.write(json.dumps({"item_id": "a", "cate_name": cate,
                            "item_image_name": "a.jpg"}) + "\n")
        # category outside the whitelist table: never cropped (reference
        # object_detection only runs listed categories)
        w.write(json.dumps({"item_id": "b", "cate_name": "nope",
                            "item_image_name": "b.jpg"}) + "\n")
    out = tmp_path / "out"
    stats = crop_images_with_boxes(str(info), str(images), str(out), {},
                                   min_crop_ratio=0.1,
                                   detector=propose_box_saliency)
    assert stats == {"cropped": 1, "copied": 1, "missing": 0}
    a = np.asarray(Image.open(out / "a.jpg"))
    b = np.asarray(Image.open(out / "b.jpg"))
    assert a.shape[0] < 100 and b.shape == (100, 100, 3)
