"""Local-weights YOLOv5 detector (data/yolo.py) — the --yolo_weights path
of the offline crop pass (reference data_prepare.py:1450-1505).

The TorchScript oracle is a tiny scripted module emitting fixed [1, N, 85]
predictions, so the test pins the full pre/post pipeline (letterbox, /255,
decode, per-class NMS, coordinate un-letterboxing) without shipping real
YOLO weights.
"""

import numpy as np
import pytest

from item_alignment_tpu.data.yolo import (
    COCO80_CLASSES, YoloTorchscriptDetector, decode_predictions, letterbox,
    nms, scale_boxes,
)


def test_letterbox_geometry():
    img = np.zeros((300, 600, 3), np.uint8)
    out, gain, (pad_w, pad_h) = letterbox(img, 640)
    # long side 600 < 640: never upscale
    assert gain == 1.0
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape == (320, 608, 3)
    assert (pad_w, pad_h) == (4.0, 10.0)
    # padding color 114 on the border rows
    assert (out[0] == 114).all() and (out[-1] == 114).all()

    big = np.zeros((1280, 960, 3), np.uint8)
    out2, gain2, _ = letterbox(big, 640)
    assert gain2 == 0.5
    assert out2.shape == (640, 480, 3)


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms(boxes, scores, iou_thres=0.45)
    assert keep == [0, 2]


def test_decode_predictions_conf_and_classes():
    # two candidate rows: a confident cell phone, a sub-threshold person
    n_cls = len(COCO80_CLASSES)
    rows = np.zeros((2, 5 + n_cls), np.float32)
    rows[0, :4] = [100, 80, 40, 60]           # xywh center format
    rows[0, 4] = 0.9
    rows[0, 5 + COCO80_CLASSES.index("cell phone")] = 0.8
    rows[1, :4] = [30, 30, 10, 10]
    rows[1, 4] = 0.3
    rows[1, 5 + COCO80_CLASSES.index("person")] = 0.5   # 0.15 < 0.25
    dets = decode_predictions(rows, conf_thres=0.25)
    assert len(dets) == 1
    x1, y1, x2, y2, name, conf = dets[0]
    assert name == "cell phone"
    assert (x1, y1, x2, y2) == (80.0, 50.0, 120.0, 110.0)
    assert conf == pytest.approx(0.72)


def test_decode_nms_is_per_class():
    # same box, two different classes: per-class NMS keeps both
    n_cls = len(COCO80_CLASSES)
    rows = np.zeros((2, 5 + n_cls), np.float32)
    for i, cls in enumerate(("bottle", "cup")):
        rows[i, :4] = [50, 50, 20, 20]
        rows[i, 4] = 0.9
        rows[i, 5 + COCO80_CLASSES.index(cls)] = 0.9
    dets = decode_predictions(rows, conf_thres=0.25)
    assert {d[4] for d in dets} == {"bottle", "cup"}


def test_scale_boxes_undoes_letterbox():
    dets = [(14.0, 30.0, 64.0, 80.0, "person", 0.9)]
    out = scale_boxes(dets, gain=0.5, pad=(4.0, 10.0), orig_hw=(200, 120))
    x1, y1, x2, y2, name, conf = out[0]
    assert (x1, y1, x2, y2) == (20.0, 40.0, 120.0, 140.0)
    assert name == "person" and conf == 0.9


def test_torchscript_detector_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")

    n_cls = len(COCO80_CLASSES)
    phone = COCO80_CLASSES.index("cell phone")

    class Fixed(torch.nn.Module):
        def __init__(self):
            super().__init__()
            pred = torch.zeros(1, 3, 5 + n_cls)
            # box at letterbox coords xywh (160, 120, 80, 80), conf .81
            pred[0, 0, 0:4] = torch.tensor([160.0, 120.0, 80.0, 80.0])
            pred[0, 0, 4] = 0.9
            pred[0, 0, 5 + phone] = 0.9
            # overlapping same-class duplicate with lower conf: NMS'd away
            pred[0, 1, 0:4] = torch.tensor([162.0, 122.0, 80.0, 80.0])
            pred[0, 1, 4] = 0.5
            pred[0, 1, 5 + phone] = 0.9
            self.pred = torch.nn.Parameter(pred, requires_grad=False)

        def forward(self, x):
            # contract check baked into the oracle: YOLOv5 eval input is
            # [1, 3, H, W] float /255
            assert x.ndim == 4 and x.shape[1] == 3
            assert float(x.max()) <= 1.0
            return self.pred

    path = str(tmp_path / "fake_yolo.torchscript.pt")
    torch.jit.script(Fixed()).save(path)

    det = YoloTorchscriptDetector(path, imgsz=640)
    # 640x1280 image: gain 0.5, pad (0, 160) -> letterbox (160,120,80,80)
    # maps back to center (320, -80+240=...) compute below
    img = np.zeros((640, 1280, 3), np.uint8)
    out = det(img)
    assert len(out) == 1
    x1, y1, x2, y2, name, conf = out[0]
    assert name == "cell phone"
    assert conf == pytest.approx(0.81)
    # letterbox: gain=.5, new (320, 640), pad_h 0? (-320)%32=0, pad_w 0
    # boxes: xyxy letterbox (120, 80, 200, 160) -> /0.5 = (240,160,400,320)
    assert (x1, y1, x2, y2) == (240.0, 160.0, 400.0, 320.0)


def test_detector_plugs_into_crop(tmp_path):
    """The detector output feeds crop_images_with_boxes' whitelist+ratio
    logic like any precomputed-box source."""
    from item_alignment_tpu.data.images import crop_largest_detection

    img = np.arange(200 * 100 * 3, dtype=np.uint8).reshape(200, 100, 3)
    dets = [(10.0, 20.0, 90.0, 180.0, "cell phone", 0.9)]
    out = crop_largest_detection(img, dets, class_whitelist=["cell phone"],
                                 min_crop_ratio=0.1)
    assert out.shape == (160, 80, 3)
    # non-whitelisted class: original returned
    out2 = crop_largest_detection(img, dets, class_whitelist=["person"],
                                  min_crop_ratio=0.1)
    assert out2 is img
