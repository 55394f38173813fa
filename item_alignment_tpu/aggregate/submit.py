"""Competition submission packaging.

The Tianchi scorer unzips ``result.zip`` containing ``similarity.py`` and
``deepAI_result.jsonl`` and calls ``compute(item_emb_1, item_emb_2)`` per
row (reference ``submit/similarity.py:27-28``, ``submit/Dockerfile``).  The
pair probability is smuggled in ``tgt_item_emb[0]``.
"""

from __future__ import annotations

import os
import zipfile
from typing import Optional

SIMILARITY_PY = '''\
import json


def compute(item_emb_1, item_emb_2):
    """Scorer entry point: the pair score is stored in tgt_item_emb[0]."""
    return item_emb_2[0]


def load_embeddings(path):
    rows = []
    with open(path, "r", encoding="utf-8") as r:
        for line in r:
            d = json.loads(line)
            rows.append((d["src_item_id"], json.loads(d["src_item_emb"]),
                         d["tgt_item_id"], json.loads(d["tgt_item_emb"]),
                         d.get("threshold", 0.0)))
    return rows
'''


def package_submission(result_jsonl: str, output_zip: str,
                       similarity_src: Optional[str] = None) -> str:
    """Zip (similarity.py, deepAI_result.jsonl) into the submission archive."""
    os.makedirs(os.path.dirname(output_zip) or ".", exist_ok=True)
    with zipfile.ZipFile(output_zip, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("similarity.py",
                   similarity_src if similarity_src else SIMILARITY_PY)
        z.write(result_jsonl, "deepAI_result.jsonl")
    return output_zip


def validate_submission(result_jsonl: str, max_dim: int = 1024) -> dict:
    """Check the competition contract: parseable rows, embeddings <= 1024
    dims, threshold present."""
    import json

    n = 0
    with open(result_jsonl, encoding="utf-8") as r:
        for line in r:
            d = json.loads(line)
            for key in ("src_item_id", "src_item_emb", "tgt_item_id",
                        "tgt_item_emb", "threshold"):
                assert key in d, f"missing {key}"
            emb = json.loads(d["tgt_item_emb"])
            assert isinstance(emb, list) and 1 <= len(emb) <= max_dim
            n += 1
    return {"rows": n, "ok": True}
