"""Prediction-level ensembling.

Re-implementation of reference ``model_ensemble.py``:

- **threshold strategy** (90-197, 219-241): per pair, accumulate
  ``prob - model_threshold`` over models; predict 1 iff the sum >= 0.
- **f1 strategy**: each model casts an f1-weighted vote for the side of its
  own threshold; majority by f1 mass wins (final score +-1.0).
- **category-aware split** (10-12, 129-162): pairs whose category never
  appears in training use a different (model, threshold) list.

Inputs/outputs are the submission-format JSONL rows produced by
``engine.train.Trainer.predict_jsonl``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from item_alignment_tpu.utils import logger

# Categories absent from training (reference model_ensemble.py:9-11)
ONLY_VALID_CATES = ['投资贵金属', '客厅吸顶灯', '衬衫', '电热水壶', '养生壶/煎药壶',
                    '鞋柜', '脱毛膏', '自热火锅', '洗烘套装', '椰棕床垫', '足浴器',
                    '茶壶', '电动自行车']
ONLY_TEST_CATES = ['鞋柜', '洗衣机', '衬衫', '茶壶', '电动自行车', '脱毛膏',
                   '投资贵金属', '椰棕床垫', '身体乳液', '客厅吸顶灯', '电热水壶',
                   '足浴器', '养生壶/煎药壶', '洗烘套装', '自热火锅']


def parse_prob(emb_str: str) -> float:
    """The scorer contract stores the pair probability in tgt_item_emb[0]
    (``submit/similarity.py:27-28``)."""
    return float(emb_str.strip()[1:-1].split(",")[0])


def read_prediction_file(path: str) -> List[Dict]:
    with open(path, encoding="utf-8") as r:
        return [json.loads(line) for line in r if line.strip()]


def write_prediction_file(rows: Iterable[Dict], path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as w:
        for row in rows:
            w.write(json.dumps(row) + "\n")
    return path


def _accumulate(lines: Dict[str, Dict], rows: Sequence[Dict],
                threshold: float, f1: float,
                keep: Optional[callable] = None) -> None:
    for d in rows:
        if keep is not None and not keep(d):
            continue
        key = d["src_item_id"] + "-" + d["tgt_item_id"]
        prob = parse_prob(d["tgt_item_emb"])
        if key not in lines:
            lines[key] = {"src_item_id": d["src_item_id"],
                          "tgt_item_id": d["tgt_item_id"],
                          "src_item_emb": d.get("src_item_emb", "[0]"),
                          "score": 0.0, "vote0": 0.0, "vote1": 0.0}
        lines[key]["score"] += prob - threshold
        if prob >= threshold:
            lines[key]["vote1"] += f1
        else:
            lines[key]["vote0"] += f1


def ensemble_predictions(
    model_predictions: Sequence[Tuple[Sequence[Dict], float, float]],
    strategy: str = "threshold",
    unseen_model_predictions: Optional[Sequence[Tuple[Sequence[Dict], float, float]]] = None,
    pair_is_unseen: Optional[callable] = None,
) -> List[Dict]:
    """Fuse per-model prediction rows.

    ``model_predictions``: list of (rows, threshold, f1_weight).
    With ``unseen_model_predictions`` + ``pair_is_unseen(row) -> bool``, the
    category-aware split applies: seen pairs use the first list, unseen
    pairs the second.

    Returns submission rows with the fused score in ``tgt_item_emb[0]`` and
    threshold 0.0.
    """
    lines: Dict[str, Dict] = {}
    if unseen_model_predictions is not None:
        assert pair_is_unseen is not None
        for rows, thr, f1 in model_predictions:
            _accumulate(lines, rows, thr, f1,
                        keep=lambda d: not pair_is_unseen(d))
        for rows, thr, f1 in unseen_model_predictions:
            _accumulate(lines, rows, thr, f1, keep=pair_is_unseen)
    else:
        for rows, thr, f1 in model_predictions:
            _accumulate(lines, rows, thr, f1)

    out = []
    positives = 0
    for key, d in lines.items():
        if strategy == "f1":
            p = 1.0 if d["vote1"] >= d["vote0"] else -1.0
        elif strategy == "threshold":
            p = d["score"]
        else:
            raise ValueError(f"unsupported ensemble strategy: {strategy}")
        positives += int(p >= 0.0)
        out.append({"src_item_id": d["src_item_id"],
                    "src_item_emb": d["src_item_emb"],
                    "tgt_item_id": d["tgt_item_id"],
                    "tgt_item_emb": f"[{p}]",
                    "threshold": 0.0})
    logger.info(f"[ensemble/{strategy}] positives {positives}/{len(out)}")
    return out


def make_unseen_checker(id_dict: Dict[str, Dict],
                        unseen_cates: Sequence[str] = tuple(ONLY_TEST_CATES)):
    unseen = set(unseen_cates)

    def check(row: Dict) -> bool:
        src = id_dict.get(row["src_item_id"], {}).get("cate_name")
        tgt = id_dict.get(row["tgt_item_id"], {}).get("cate_name")
        return src in unseen or tgt in unseen

    return check
