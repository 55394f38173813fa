"""Image preprocessing pipeline.

Replaces the reference's ``timm.data.create_transform`` usage
(``src/data/data.py:835-869``, ``data_prepare.py:275-364``) with
PIL+numpy host preprocessing and an on-device (jax.image) variant:

- train: resize -> random crop -> random hflip (p=0.5) -> normalize
- eval:  resize (shorter side / crop_pct) -> center crop -> normalize

Defaults follow timm's ImageNet config (bicubic, crop_pct 0.875 for conv
nets / 1.0 at 384 ViT, mean/std IMAGENET_DEFAULT).  Also includes the
offline ``image_embedding.json``-style dump helper mirroring
``load_image_embedding`` (data_prepare.py:275-364) and the LMDB-shard
equivalent as simple .npz shards (tensorpack LMDBSerializer replacement,
data_prepare.py:1253-1448).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image(path: str) -> Optional[np.ndarray]:
    """uint8 HWC RGB, or None for broken images (silently dropped by the
    reference, data.py:859-860)."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


def _resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize(
        (size[1], size[0]), Image.BICUBIC))


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    return img[top:top + size, left:left + size]


def normalize(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def eval_transform(img: np.ndarray, image_size: int,
                   crop_pct: float = 0.875) -> np.ndarray:
    """resize shorter side to size/crop_pct then center crop (timm eval)."""
    scale_size = int(round(image_size / crop_pct))
    h, w = img.shape[:2]
    if h < w:
        new_h, new_w = scale_size, int(round(w * scale_size / h))
    else:
        new_h, new_w = int(round(h * scale_size / w)), scale_size
    img = _resize(img, (new_h, new_w))
    return normalize(center_crop(img, image_size))


def train_transform(img: np.ndarray, image_size: int,
                    rng: Optional[np.random.RandomState] = None,
                    hflip: float = 0.5,
                    scale: Tuple[float, float] = (0.08, 1.0),
                    ratio: Tuple[float, float] = (3 / 4, 4 / 3)) -> np.ndarray:
    """random-resized-crop + hflip + normalize (timm train, no jitter by
    default like the reference's nfnet config)."""
    rng = rng or np.random.RandomState()
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        aspect = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if cw <= w and ch <= h:
            top = rng.randint(0, h - ch + 1)
            left = rng.randint(0, w - cw + 1)
            img_c = img[top:top + ch, left:left + cw]
            break
    else:
        img_c = center_crop(img, min(h, w))
    img_c = _resize(img_c, (image_size, image_size))
    if rng.rand() < hflip:
        img_c = img_c[:, ::-1]
    return normalize(np.ascontiguousarray(img_c))


def device_resize_normalize(images_u8, image_size: int):
    """On-device eval path: uint8 [B,H,W,3] -> normalized [B,S,S,3] via
    jax.image (fused with the model under jit; keeps host out of the loop)."""
    import jax
    import jax.numpy as jnp

    x = images_u8.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], image_size, image_size, 3),
                         method="bilinear")
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


# ---------------------------------------------------------- offline dumps
def dump_image_embeddings(item_ids: Sequence[str],
                          image_paths: Sequence[str],
                          encode_fn: Callable[[np.ndarray], np.ndarray],
                          out_path: str, image_size: int = 288,
                          batch_size: int = 32) -> Dict[str, List[float]]:
    """Run an image tower over all items, write ``image_embedding.json``
    {item_id: embedding} (load_image_embedding, data_prepare.py:275-364)."""
    result: Dict[str, List[float]] = {}
    batch_imgs, batch_ids = [], []

    def flush():
        if not batch_imgs:
            return
        embs = encode_fn(np.stack(batch_imgs))
        for iid, e in zip(batch_ids, np.asarray(embs)):
            result[iid] = [float(x) for x in e]
        batch_imgs.clear()
        batch_ids.clear()

    for iid, path in zip(item_ids, image_paths):
        img = load_image(path)
        if img is None:
            continue
        batch_imgs.append(eval_transform(img, image_size))
        batch_ids.append(iid)
        if len(batch_imgs) == batch_size:
            flush()
    flush()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as w:
        json.dump(result, w)
    return result


def write_image_shards(pairs: Iterable[Tuple[str, np.ndarray, np.ndarray, int]],
                       out_dir: str, shard_size: int = 1024,
                       prefix: str = "train_feat") -> List[str]:
    """Serialize (pair_id, img1, img2, label) into .npz shards — the
    tensorpack-LMDB equivalent (data_prepare.py:1253-1448)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    buf: List[Tuple[str, np.ndarray, np.ndarray, int]] = []
    shard = 0

    def flush():
        nonlocal shard
        if not buf:
            return
        path = os.path.join(out_dir, f"{prefix}_{shard}.npz")
        np.savez_compressed(
            path,
            pair_ids=np.array([b[0] for b in buf]),
            images_1=np.stack([b[1] for b in buf]),
            images_2=np.stack([b[2] for b in buf]),
            labels=np.array([b[3] for b in buf], np.int32))
        paths.append(path)
        shard += 1
        buf.clear()

    for rec in pairs:
        buf.append(rec)
        if len(buf) == shard_size:
            flush()
    flush()
    return paths


def read_image_shards(paths: Sequence[str]):
    for path in paths:
        with np.load(path, allow_pickle=False) as z:
            yield {k: z[k] for k in z.files}


# ------------------------------------------------- detection-guided crop
def crop_largest_detection(
    img: np.ndarray,
    detections: Sequence[Tuple[float, float, float, float, str, float]],
    class_whitelist: Optional[Sequence[str]] = None,
    min_crop_ratio: float = 0.1,
) -> np.ndarray:
    """Object-detection-guided crop (reference ``object_detection``,
    data_prepare.py:1450-1505): crop the LARGEST whitelisted box if its
    area ratio exceeds ``min_crop_ratio``, else return the original image.

    ``detections`` rows are (x1, y1, x2, y2, class_name, confidence) from
    any external detector (the reference shells out to torch.hub YOLOv5,
    which needs network access; here boxes arrive precomputed).  The
    per-category class whitelist corresponds to the reference's
    CATE2YOLO_CLASS table (data_prepare.py:36-169) supplied by the caller.
    """
    h, w = img.shape[:2]
    best = None
    best_area = 0.0
    for (x1, y1, x2, y2, cls, _conf) in detections:
        if class_whitelist is not None and cls not in class_whitelist:
            continue
        area = max(x2 - x1, 0) * max(y2 - y1, 0)
        if area > best_area:
            best_area = area
            best = (x1, y1, x2, y2)
    if best is None or best_area / float(h * w) <= min_crop_ratio:
        return img
    x1, y1, x2, y2 = (int(round(v)) for v in best)
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(x2, w), min(y2, h)
    if x2 <= x1 or y2 <= y1:
        return img
    return img[y1:y2, x1:x2]
