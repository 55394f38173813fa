"""Sequence-layout builders: raw pair rows -> fixed-shape numpy arrays.

Faithful re-implementations of the layouts in reference
``src/data/data.py`` (tokenization moves offline because XLA wants static
shapes; the reference re-tokenizes per sample per epoch):

- one-tower ``cls``:      ``[CLS] src [SEP] tgt [SEP]`` via HF pair encoding,
  LONGEST_FIRST truncation to 2*max_length (data.py:558-563)
- one-tower ``vec_sim``:  independently padded src + ``[BOS]`` + tgt[1:],
  token_type+1 on the tgt half (data.py:548-556)
- two-tower:              per-item ``title [SEP] jieba(pvs)`` (data.py:786-832)
- PKGM layouts:           text ids + [entity, relations...] id-space, with
  embedded-space masks/token-types/positions (data.py:277-516)
- image one-tower:        ``[unused99] [SEP]`` prefix + per-sample tgt image
  token index (data.py:623-753)
- aux-task pair_indices:  colon/semicolon scan over pv ids (data.py:568-615),
  padded to a fixed [max_pairs, 5] block.

Constants from data.py:9-12.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from item_alignment_tpu.data.datasets import ArrayDataset
from item_alignment_tpu.utils import BOS_TOKEN

IMG_TOKEN = "[unused99]"
IMG_TOKEN_ID = 99
COLON_ID = 131
SEMICOLON_ID = 132


def _parse_embedding_column(s, image_hidden_size: int) -> np.ndarray:
    """Comma-joined float text (one TSV image-embedding column,
    data.py:650-656) -> fixed ``[image_hidden_size]`` fp32, zero-padded.
    numpy parses the split strings in C — a ``float(x)`` loop costs minutes
    over a 65k-pair corpus (2 x 3072 floats per row)."""
    out = np.zeros(image_hidden_size, np.float32)
    if s:
        parts = [p for p in s.split(",") if p.strip()]
        if parts:
            vals = np.asarray(parts[:image_hidden_size], dtype=np.float32)
            out[: len(vals)] = vals
    return out


def load_text_tokenizer(path_or_name: str):
    """BertTokenizer with the reference's bos ``"<S>"`` mapped in
    (``finetune_text.py:187-189``), basic tokenization disabled for parity."""
    from transformers import BertTokenizer

    tok = BertTokenizer.from_pretrained(path_or_name)
    tok.do_basic_tokenize = False  # finetune_text.py:188 — wordpiece only,
    # so [unused99] image tokens survive and Chinese text is not re-split
    tok.add_special_tokens({"bos_token": BOS_TOKEN})
    return tok


def segment_pvs(pvs: str) -> str:
    """jieba word segmentation, space-joined (data.py:541-544)."""
    import jieba

    return " ".join(jieba.cut(pvs))


def build_item_text(title: str, pvs: str, sep_token: str = "[SEP]") -> str:
    """``title [SEP] jieba(pvs)`` (data.py:541-544)."""
    return " ".join((title, sep_token, segment_pvs(pvs)))


# ----------------------------------------------------------------- layouts
def encode_one_tower_cls(tok, src_text: str, tgt_text: str, max_length: int
                         ) -> Dict[str, List[int]]:
    enc = tok(text=src_text, text_pair=tgt_text, max_length=2 * max_length,
              padding="max_length", truncation="longest_first")
    return {"input_ids": enc["input_ids"],
            "token_type_ids": enc["token_type_ids"],
            "attention_mask": enc["attention_mask"]}


def encode_one_tower_vec_sim(tok, src_text: str, tgt_text: str, max_length: int
                             ) -> Dict[str, List[int]]:
    src = tok(text=src_text, max_length=max_length, padding="max_length",
              truncation="longest_first")
    tgt = tok(text=tgt_text, max_length=max_length, padding="max_length",
              truncation="longest_first")
    input_ids = src["input_ids"] + [tok.bos_token_id] + tgt["input_ids"][1:]
    token_type_ids = src["token_type_ids"] + [t + 1 for t in tgt["token_type_ids"]]
    attention_mask = src["attention_mask"] + tgt["attention_mask"]
    return {"input_ids": input_ids, "token_type_ids": token_type_ids,
            "attention_mask": attention_mask}


def encode_two_tower_item(tok, text: str, max_length: int) -> Dict[str, List[int]]:
    enc = tok(text=text, max_length=max_length, padding="max_length",
              truncation="longest_first")
    return {"input_ids": enc["input_ids"],
            "token_type_ids": enc["token_type_ids"],
            "attention_mask": enc["attention_mask"]}


def extract_pair_indices(input_ids: Sequence[int], sep_id: int,
                         max_pairs: int) -> np.ndarray:
    """Aligned-pv-pair spans for the auxiliary task (data.py:568-615).

    Walks src/tgt pv regions in lockstep; for each aligned key emits
    (src_start, src_end, tgt_start, tgt_end, same_value).  Padded to
    [max_pairs, 5] with -1 rows.
    """
    pos_sep = [i for i, t in enumerate(input_ids) if t == sep_id]
    out = np.full((max_pairs, 5), -1, dtype=np.int32)
    if len(pos_sep) < 4:
        return out
    src_pre, tgt_pre = pos_sep[0] + 1, pos_sep[2] + 1
    src_ids = list(input_ids[pos_sep[0] + 1: pos_sep[1]])
    tgt_ids = list(input_ids[pos_sep[2] + 1: pos_sep[3]])
    pairs = []
    src_p = tgt_p = 0
    src_colon, src_semi, src_prev_semi = None, -1, None
    tgt_colon, tgt_semi, tgt_prev_semi = None, -1, None
    while src_p < len(src_ids) and tgt_p < len(tgt_ids):
        while src_p < len(src_ids):
            if src_ids[src_p] == COLON_ID:
                src_colon = src_p
            elif src_ids[src_p] == SEMICOLON_ID:
                src_prev_semi = src_semi
                src_semi = src_p
                src_p += 1
                break
            src_p += 1
        else:
            break
        while tgt_p < len(tgt_ids):
            if tgt_ids[tgt_p] == COLON_ID:
                tgt_colon = tgt_p
            elif tgt_ids[tgt_p] == SEMICOLON_ID:
                tgt_prev_semi = tgt_semi
                tgt_semi = tgt_p
                tgt_p += 1
                break
            tgt_p += 1
        else:
            break
        src_key = src_ids[src_prev_semi + 1: src_colon]
        src_value = src_ids[src_colon + 1: src_semi]
        tgt_key = tgt_ids[tgt_prev_semi + 1: tgt_colon]
        tgt_value = tgt_ids[tgt_colon + 1: tgt_semi]
        if src_key != tgt_key:
            break
        pairs.append([src_prev_semi + 1 + src_pre, src_semi + src_pre,
                      tgt_prev_semi + 1 + tgt_pre, tgt_semi + tgt_pre,
                      1 if src_value == tgt_value else 0])
    for i, p in enumerate(pairs[:max_pairs]):
        out[i] = p
    return out


# --------------------------------------------------------------- PKGM
def _pad_text_sequence(ids: List[int], token_type_id: int, max_len: int):
    mask = [1] * len(ids)
    tt = [token_type_id] * len(ids)
    ids = ids + [0] * (max_len - len(ids))
    mask = mask + [0] * (max_len - len(mask))
    tt = tt + [0] * (max_len - len(tt))
    return ids, mask, tt


def _pad_kg_sequence(ids: List[int], token_type_id: int, max_pvs: int):
    """ids = [entity, rel...]; masks/token-types cover the 2*max_pvs embedded
    kg tokens (data.py:378-388: each relation becomes 2 query tokens)."""
    n_rel = max(len(ids) - 1, 0)
    mask = [1] * (n_rel * 2)
    tt = [token_type_id] * (n_rel * 2)
    ids = ids + [0] * (max_pvs + 1 - len(ids))
    mask = mask + [0] * (2 * max_pvs - len(mask))
    tt = tt + [0] * (2 * max_pvs - len(tt))
    return ids, mask, tt


def encode_pkgm_item(tok, kg_ent: Dict[str, int], kg_rel: Dict[str, int],
                     item_id: str, title: str, pvs: str, max_seq_len: int,
                     max_pvs: int, token_type_id: int = 0,
                     leading_token: Optional[str] = None,
                     kg_token_type_id: Optional[int] = None):
    """One PKGM item: text ids (max_seq_len) + kg ids (1+max_pvs) in id-space;
    mask/token-types in embedded space (max_seq_len + 2*max_pvs).

    One-tower uses one token type for both parts (0 src / 1 tgt,
    data.py:328-341); two-tower uses text 0 / kg 1 (data.py:430-445) via
    ``kg_token_type_id``.
    """
    if kg_token_type_id is None:
        kg_token_type_id = token_type_id
    title_ids = tok.convert_tokens_to_ids(tok.tokenize(title))[: max_seq_len - 2]
    lead = tok.cls_token_id if leading_token is None else \
        tok.convert_tokens_to_ids(leading_token)
    text_ids = [lead] + title_ids + [tok.sep_token_id]
    text_ids, text_mask, text_tt = _pad_text_sequence(
        text_ids, token_type_id, max_seq_len)

    rel_ids = []
    for pv in pvs.split(";"):
        try:
            r, _ = pv.split(":", maxsplit=1)
        except ValueError:
            continue
        if r in kg_rel:
            rel_ids.append(kg_rel[r])
    kg_ids = []
    if rel_ids:
        kg_ids = [kg_ent.get(f"/item/{item_id}", 0)] + rel_ids
    kg_ids = kg_ids[: 1 + max_pvs]
    kg_ids, kg_mask, kg_tt = _pad_kg_sequence(kg_ids, kg_token_type_id, max_pvs)

    return (text_ids + kg_ids, text_mask + kg_mask, text_tt + kg_tt)


def encode_pkgm_one_tower(tok, kg_ent, kg_rel, row, max_seq_len: int,
                          max_pvs: int, classification_method: str = "cls"):
    """(data.py:277-392): src block then tgt block; tgt leading token is
    [BOS] for vec_sim else [SEP]."""
    (label, src_item_id, _, src_title, src_pvs,
     tgt_item_id, _, tgt_title, tgt_pvs) = row
    src_ids, src_mask, src_tt = encode_pkgm_item(
        tok, kg_ent, kg_rel, src_item_id, src_title, src_pvs,
        max_seq_len, max_pvs, token_type_id=0)
    lead = BOS_TOKEN if classification_method == "vec_sim" else tok.sep_token
    tgt_ids, tgt_mask, tgt_tt = encode_pkgm_item(
        tok, kg_ent, kg_rel, tgt_item_id, tgt_title, tgt_pvs,
        max_seq_len, max_pvs, token_type_id=1, leading_token=lead)
    embed_len = 2 * (max_seq_len + 2 * max_pvs)
    return {
        "input_ids": src_ids + tgt_ids,
        "attention_mask": src_mask + tgt_mask,
        "token_type_ids": src_tt + tgt_tt,
        "position_ids": list(range(embed_len)),
        "labels": int(label),
    }


# ------------------------------------------------------------ image splice
def _image_item_text(title: str, pvs: str, max_seq_len, max_seq_len_pv, tok):
    """Reference text gating (data.py:637-648 / 697-708): title-only when
    max_seq_len_pv is None, raw pvs when max_seq_len is None, else
    ``title [SEP] jieba(pvs)``.  Returns (text, max_length)."""
    if max_seq_len is None:
        return pvs, max_seq_len_pv
    if max_seq_len_pv is None:
        return title, max_seq_len
    return (build_item_text(title, pvs, tok.sep_token),
            max_seq_len + max_seq_len_pv)


def encode_image_one_tower(tok, src_text: str, tgt_text: str, max_length: int,
                           ensemble: str = "begin") -> Dict[str, list]:
    """roberta_image one-tower layout (data.py:650-677): with
    ``ensemble=="begin"`` each text is prefixed ``[IMG] [SEP]`` ->
    ``[CLS] [IMG] [SEP] src [SEP] [IMG] [SEP] tgt [SEP]``; the tgt [IMG]
    index is recorded per sample for the embedding splice.  Other ensemble
    modes keep the plain pair layout (image embeds join at the head)."""
    if ensemble == "begin":
        src_text = " ".join((IMG_TOKEN, tok.sep_token, src_text))
        tgt_text = " ".join((IMG_TOKEN, tok.sep_token, tgt_text))
    enc = tok(text=src_text, text_pair=tgt_text, max_length=2 * max_length,
              padding="max_length", truncation="longest_first")
    ids = enc["input_ids"]
    image_index = 0
    if ensemble == "begin":
        img_positions = [i for i, t in enumerate(ids) if t == IMG_TOKEN_ID]
        image_index = img_positions[1] if len(img_positions) > 1 else 1
    return {"input_ids": ids, "token_type_ids": enc["token_type_ids"],
            "attention_mask": enc["attention_mask"],
            "image_indices": image_index}


# ----------------------------------------------------------- dataset build
def _encode_one_tower_row(row, tok, max_seq_len, max_seq_len_pv,
                          classification_method, auxiliary_task, max_pairs):
    """Module-level row encoder (picklable for multiprocessing)."""
    (label, src_item_id, _, src_title, src_pvs,
     tgt_item_id, _, tgt_title, tgt_pvs) = row
    if max_seq_len is None:
        src_text, tgt_text, max_length = src_pvs, tgt_pvs, max_seq_len_pv
    elif max_seq_len_pv is None:
        src_text, tgt_text, max_length = src_title, tgt_title, max_seq_len
    else:
        src_text = build_item_text(src_title, src_pvs, tok.sep_token)
        tgt_text = build_item_text(tgt_title, tgt_pvs, tok.sep_token)
        max_length = max_seq_len + max_seq_len_pv
    if classification_method == "vec_sim":
        enc = encode_one_tower_vec_sim(tok, src_text, tgt_text, max_length)
    else:
        enc = encode_one_tower_cls(tok, src_text, tgt_text, max_length)
    enc["labels"] = int(label)
    if auxiliary_task:
        enc["pair_spans"] = extract_pair_indices(
            enc["input_ids"], tok.sep_token_id, max_pairs)
    enc["src_item_id"] = src_item_id
    enc["tgt_item_id"] = tgt_item_id
    return enc


def rows_to_one_tower_dataset(
    rows: Sequence, tok, max_seq_len: Optional[int], max_seq_len_pv: Optional[int],
    classification_method: str = "cls", auxiliary_task: bool = False,
    max_pairs: int = 32, num_workers: int = 0,
) -> ArrayDataset:
    """TSV rows (label, src_id, src_cate, src_title, src_pvs, tgt_id,
    tgt_cate, tgt_title, tgt_pvs) -> fixed arrays (RobertaOneTowerDataset,
    data.py:519-620).

    ``num_workers > 1`` fans the tokenization out over processes — the
    reference instead re-tokenizes every sample in DataLoader workers each
    epoch; here it happens exactly once, offline.
    """
    import functools

    encode = functools.partial(
        _encode_one_tower_row, tok=tok, max_seq_len=max_seq_len,
        max_seq_len_pv=max_seq_len_pv,
        classification_method=classification_method,
        auxiliary_task=auxiliary_task, max_pairs=max_pairs)
    if num_workers > 1 and len(rows) >= 4 * num_workers:
        import multiprocessing as mp

        with mp.get_context("fork").Pool(num_workers) as pool:
            encs = pool.map(encode, rows, chunksize=64)
    else:
        encs = [encode(row) for row in rows]

    feats: Dict[str, list] = {"input_ids": [], "token_type_ids": [],
                              "attention_mask": [], "labels": []}
    if auxiliary_task:
        feats["pair_spans"] = []
    meta = {"src_item_id": [], "tgt_item_id": []}
    for enc in encs:
        for k in feats:
            feats[k].append(enc[k])
        meta["src_item_id"].append(enc["src_item_id"])
        meta["tgt_item_id"].append(enc["tgt_item_id"])
    arrays = {k: np.asarray(v, dtype=np.int32) for k, v in feats.items()}
    return ArrayDataset(arrays, meta)


def rows_to_two_tower_dataset(
    rows: Sequence, tok, max_seq_len: Optional[int], max_seq_len_pv: Optional[int],
) -> ArrayDataset:
    """-> input_ids_{1,2}/attention_mask_{1,2}/token_type_ids_{1,2}
    (RobertaTwoTowerDataset, data.py:786-832)."""
    feats: Dict[str, list] = {f"{k}_{i}": [] for k in
                              ("input_ids", "attention_mask", "token_type_ids")
                              for i in (1, 2)}
    feats["labels"] = []
    meta = {"src_item_id": [], "tgt_item_id": []}
    max_length = (max_seq_len or 0) + (max_seq_len_pv or 0)
    for row in rows:
        (label, src_item_id, _, src_title, src_pvs,
         tgt_item_id, _, tgt_title, tgt_pvs) = row
        for i, (title, pvs) in enumerate(((src_title, src_pvs),
                                          (tgt_title, tgt_pvs)), start=1):
            text = build_item_text(title, pvs, tok.sep_token)
            enc = encode_two_tower_item(tok, text, max_length)
            feats[f"input_ids_{i}"].append(enc["input_ids"])
            feats[f"attention_mask_{i}"].append(enc["attention_mask"])
            feats[f"token_type_ids_{i}"].append(enc["token_type_ids"])
        feats["labels"].append(int(label))
        meta["src_item_id"].append(src_item_id)
        meta["tgt_item_id"].append(tgt_item_id)
    arrays = {k: np.asarray(v, dtype=np.int32) for k, v in feats.items()}
    return ArrayDataset(arrays, meta)


def rows_to_image_one_tower_dataset(
    rows: Sequence, tok, max_seq_len: Optional[int],
    max_seq_len_pv: Optional[int], image_hidden_size: int = 3072,
    ensemble: str = "begin",
) -> ArrayDataset:
    """9-column TSV rows with img-emb strings (label, src_id, src_title,
    src_pvs, src_img_emb, tgt_id, tgt_title, tgt_pvs, tgt_img_emb) ->
    roberta_image one-tower arrays (RobertaImageOneTowerDataset,
    data.py:623-680; [IMG] prefix gated on ``ensemble=="begin"``,
    title-only/pvs-only text when a seq len is None)."""
    feats: Dict[str, list] = {"input_ids": [], "token_type_ids": [],
                              "attention_mask": [], "image_indices": [],
                              "labels": []}
    img_feats = {"src_image_embeds": [], "tgt_image_embeds": []}
    meta = {"src_item_id": [], "tgt_item_id": []}
    for row in rows:
        (label, src_item_id, src_title, src_pvs, src_emb,
         tgt_item_id, tgt_title, tgt_pvs, tgt_emb) = row
        src_text, max_length = _image_item_text(
            src_title, src_pvs, max_seq_len, max_seq_len_pv, tok)
        tgt_text, _ = _image_item_text(
            tgt_title, tgt_pvs, max_seq_len, max_seq_len_pv, tok)
        enc = encode_image_one_tower(tok, src_text, tgt_text, max_length,
                                     ensemble)
        for k in ("input_ids", "token_type_ids", "attention_mask",
                  "image_indices"):
            feats[k].append(enc[k])
        feats["labels"].append(int(label))

        img_feats["src_image_embeds"].append(
            _parse_embedding_column(src_emb, image_hidden_size))
        img_feats["tgt_image_embeds"].append(
            _parse_embedding_column(tgt_emb, image_hidden_size))
        meta["src_item_id"].append(src_item_id)
        meta["tgt_item_id"].append(tgt_item_id)
    arrays = {k: np.asarray(v, np.int32) for k, v in feats.items()}
    arrays.update({k: np.stack(v) for k, v in img_feats.items()})
    return ArrayDataset(arrays, meta)


def rows_to_image_two_tower_dataset(
    rows: Sequence, tok, max_seq_len: Optional[int],
    max_seq_len_pv: Optional[int], image_hidden_size: int = 3072,
    ensemble: str = "begin",
) -> ArrayDataset:
    """9-column TSV rows -> per-item roberta_image two-tower arrays
    (RobertaImageTwoTowerDataset, data.py:682-753): each item is encoded
    separately; with ``ensemble=="begin"`` as ``[CLS] [IMG] [SEP] title
    [SEP] pvs`` (the [IMG] token sits at position 1, where the embedding
    splice puts the projected image vector), plain text otherwise;
    title-only/pvs-only text when a seq len is None."""
    feats: Dict[str, list] = {f"{k}_{i}": [] for k in
                              ("input_ids", "attention_mask",
                               "token_type_ids")
                              for i in (1, 2)}
    feats["labels"] = []
    img_feats = {"image_embeds_1": [], "image_embeds_2": []}
    meta = {"src_item_id": [], "tgt_item_id": []}

    for row in rows:
        (label, src_item_id, src_title, src_pvs, src_emb,
         tgt_item_id, tgt_title, tgt_pvs, tgt_emb) = row
        for i, (title, pvs, emb) in enumerate(
                ((src_title, src_pvs, src_emb),
                 (tgt_title, tgt_pvs, tgt_emb)), start=1):
            text, max_length = _image_item_text(
                title, pvs, max_seq_len, max_seq_len_pv, tok)
            if ensemble == "begin":
                text = " ".join((IMG_TOKEN, tok.sep_token, text))
            enc = tok(text=text, max_length=max_length,
                      padding="max_length", truncation="longest_first")
            feats[f"input_ids_{i}"].append(enc["input_ids"])
            feats[f"attention_mask_{i}"].append(enc["attention_mask"])
            feats[f"token_type_ids_{i}"].append(enc["token_type_ids"])
            img_feats[f"image_embeds_{i}"].append(
                _parse_embedding_column(emb, image_hidden_size))
        feats["labels"].append(int(label))
        meta["src_item_id"].append(src_item_id)
        meta["tgt_item_id"].append(tgt_item_id)
    arrays = {k: np.asarray(v, np.int32) for k, v in feats.items()}
    arrays.update({k: np.stack(v) for k, v in img_feats.items()})
    return ArrayDataset(arrays, meta)


def rows_to_pkgm_dataset(rows, tok, kg_ent, kg_rel, max_seq_len: int,
                         max_pvs: int, classification_method: str = "cls"
                         ) -> ArrayDataset:
    feats = {"input_ids": [], "attention_mask": [], "token_type_ids": [],
             "position_ids": [], "labels": []}
    meta = {"src_item_id": [], "tgt_item_id": []}
    for row in rows:
        enc = encode_pkgm_one_tower(tok, kg_ent, kg_rel, row, max_seq_len,
                                    max_pvs, classification_method)
        for k in feats:
            feats[k].append(enc[k])
        meta["src_item_id"].append(row[1])
        meta["tgt_item_id"].append(row[5])
    arrays = {k: np.asarray(v, dtype=np.int32) for k, v in feats.items()}
    return ArrayDataset(arrays, meta)


def rows_to_pv_pair_dataset(rows, tok, max_seq_len: int, max_seq_len_pv: int
                            ) -> ArrayDataset:
    """pv-pair text variant (RobertaOneTowerPvPairDataset, data.py:756-783;
    unused by the reference's final pipeline but part of the surface):
    rows are (label, src_id, src_title, tgt_id, tgt_title, pv_pair_text);
    layout = tokenizer(src_title, tgt_title [SEP] jieba(pv_pair_text)) with
    token types bumped +1 after the second [SEP]."""
    feats: Dict[str, list] = {"input_ids": [], "token_type_ids": [],
                              "attention_mask": [], "labels": []}
    meta = {"src_item_id": [], "tgt_item_id": []}
    max_length = 2 * max_seq_len + max_seq_len_pv
    for (label, src_item_id, src_title, tgt_item_id, tgt_title,
         pv_pair_text) in rows:
        src_text = src_title
        tgt_text = " ".join((tgt_title, tok.sep_token,
                             segment_pvs(pv_pair_text)))
        enc = tok(text=src_text, text_pair=tgt_text, max_length=max_length,
                  padding="max_length", truncation="longest_first")
        ids = enc["input_ids"]
        i1 = ids.index(tok.sep_token_id)
        i2 = ids.index(tok.sep_token_id, i1 + 1)
        tt = enc["token_type_ids"]
        tt = tt[: i2 + 1] + [t + 1 for t in tt[i2 + 1:]]
        feats["input_ids"].append(ids)
        feats["token_type_ids"].append(tt)
        feats["attention_mask"].append(enc["attention_mask"])
        feats["labels"].append(int(label))
        meta["src_item_id"].append(src_item_id)
        meta["tgt_item_id"].append(tgt_item_id)
    arrays = {k: np.asarray(v, np.int32) for k, v in feats.items()}
    return ArrayDataset(arrays, meta)


def rows_to_pkgm_two_tower_dataset(rows, tok, kg_ent, kg_rel,
                                   max_seq_len: int, max_pvs: int
                                   ) -> ArrayDataset:
    """Per-item PKGM layouts for the two-tower model
    (PKGMTwoTowerDataset, data.py:394-516): each side gets its own
    id-space ids + embedded-space masks; positions are shared."""
    feats = {f"{k}_{i}": [] for k in ("input_ids", "attention_mask",
                                      "token_type_ids") for i in (1, 2)}
    feats["labels"] = []
    embed_len = max_seq_len + 2 * max_pvs
    position_ids = list(range(embed_len))
    pos_rows = []
    meta = {"src_item_id": [], "tgt_item_id": []}
    for row in rows:
        (label, src_item_id, _, src_title, src_pvs,
         tgt_item_id, _, tgt_title, tgt_pvs) = row
        for i, (iid, title, pvs, tt) in enumerate(
                ((src_item_id, src_title, src_pvs, 0),
                 (tgt_item_id, tgt_title, tgt_pvs, 0)), start=1):
            ids, mask, ttids = encode_pkgm_item(
                tok, kg_ent, kg_rel, iid, title, pvs, max_seq_len, max_pvs,
                token_type_id=tt, kg_token_type_id=1)
            feats[f"input_ids_{i}"].append(ids)
            feats[f"attention_mask_{i}"].append(mask)
            feats[f"token_type_ids_{i}"].append(ttids)
        feats["labels"].append(int(label))
        pos_rows.append(position_ids)
        meta["src_item_id"].append(src_item_id)
        meta["tgt_item_id"].append(tgt_item_id)
    arrays = {k: np.asarray(v, np.int32) for k, v in feats.items()}
    arrays["position_ids"] = np.asarray(pos_rows, np.int32)
    return ArrayDataset(arrays, meta)


def build_multimodal_pretrain_dataset(
    items: Sequence[Dict], tok, image_loader, max_seq_len: int,
    image_size: int, bos: bool = False,
) -> ArrayDataset:
    """CoCa pretrain examples: per-item ``title [SEP] jieba(pvs)`` text +
    transformed main image (MultimodalDataset, data.py:872-930).

    ``items``: dicts with title/pvs/image_path; ``image_loader(path) ->
    HWC uint8 or None`` (broken images dropped, matching the reference).
    """
    from item_alignment_tpu.data.images import eval_transform

    feats = {"input_ids": [], "attention_mask": [], "token_type_ids": [],
             "images": []}
    meta = {"item_id": []}
    for item in items:
        img = image_loader(item["image_path"])
        if img is None:
            continue
        text = build_item_text(item.get("title", ""), item.get("pvs", ""),
                               tok.sep_token)
        if bos:
            text = f"{tok.bos_token} {text}"  # ensemble=="sum" prefix
        enc = tok(text=text, max_length=max_seq_len, padding="max_length",
                  truncation="longest_first")
        feats["input_ids"].append(enc["input_ids"])
        feats["attention_mask"].append(enc["attention_mask"])
        feats["token_type_ids"].append(enc["token_type_ids"])
        feats["images"].append(eval_transform(img, image_size,
                                             normalized=False))
        meta["item_id"].append(item.get("item_id", ""))
    arrays = {k: np.asarray(v, np.int32) for k, v in feats.items()
              if k != "images"}
    # post-transform uint8: 4x less host RAM / host->device traffic;
    # the ViT tower normalizes uint8 inputs on-device with bit-identical
    # math (models/image.py maybe_normalize_uint8)
    arrays["images"] = np.stack(feats["images"]) if feats["images"] \
        else np.zeros((0, image_size, image_size, 3), np.uint8)
    return ArrayDataset(arrays, meta)


def build_multimodal_pair_dataset(
    rows: Sequence, tok, image_loader, image_paths: Dict[str, str],
    max_seq_len: int, max_seq_len_pv: Optional[int], image_size: int,
    bos: bool = False,
) -> ArrayDataset:
    """CoCa finetune pairs: per-item text + transformed image for both sides
    (PairedMultimodalDataset, data.py:933-989).  Rows are the 9-tuple
    finetune rows; ``image_paths`` maps item_id -> file."""
    from item_alignment_tpu.data.images import eval_transform

    feats: Dict[str, list] = {f"{k}_{i}": [] for k in
                              ("input_ids", "attention_mask")
                              for i in (1, 2)}
    feats.update(images_1=[], images_2=[], labels=[])
    meta = {"src_item_id": [], "tgt_item_id": []}
    max_length = (max_seq_len or 0) + (max_seq_len_pv or 0)
    for row in rows:
        (label, sid, _, s_title, s_pvs, tid, _, t_title, t_pvs) = row
        img1 = image_loader(image_paths.get(sid, ""))
        img2 = image_loader(image_paths.get(tid, ""))
        if img1 is None or img2 is None:
            continue
        for i, (title, pvs) in enumerate(((s_title, s_pvs),
                                          (t_title, t_pvs)), start=1):
            text = build_item_text(title, pvs, tok.sep_token)
            if bos:
                text = f"{tok.bos_token} {text}"
            enc = tok(text=text, max_length=max_length,
                      padding="max_length", truncation="longest_first")
            feats[f"input_ids_{i}"].append(enc["input_ids"])
            feats[f"attention_mask_{i}"].append(enc["attention_mask"])
        feats["images_1"].append(eval_transform(img1, image_size,
                                               normalized=False))
        feats["images_2"].append(eval_transform(img2, image_size,
                                               normalized=False))
        feats["labels"].append(int(label))
        meta["src_item_id"].append(sid)
        meta["tgt_item_id"].append(tid)
    arrays = {k: np.asarray(v, np.int32) for k, v in feats.items()
              if not k.startswith("images")}
    for k in ("images_1", "images_2"):
        # post-transform uint8 (see build_multimodal_pretrain_dataset)
        arrays[k] = np.stack(feats[k]) if feats[k] else \
            np.zeros((0, image_size, image_size, 3), np.uint8)
    return ArrayDataset(arrays, meta)


def load_kg_tokenizers(entity2id_path: str, relation2id_path: str
                       ) -> Tuple[Dict[str, int], Dict[str, int]]:
    """Read ``entity2id.txt``/``relation2id.txt`` — plain ``name\\tid`` rows,
    no count header (finetune_text.py:153-172, data_prepare.py:727-735)."""

    def read(path):
        d = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip("\n")
                if not line.strip():
                    continue
                name, idx = line.rsplit("\t", 1)
                d[name] = int(idx)
        return d

    return read(entity2id_path), read(relation2id_path)
