"""CLI smoke tests: prepare -> finetune-text -> soup -> ensemble round trip
on a synthetic corpus through the ``ia-tpu`` command surface."""

import json
import os
import random

import numpy as np
import pytest

from item_alignment_tpu.cli import main


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    raw = tmp / "raw"
    raw.mkdir()
    rng = random.Random(0)
    cates = {"coffee": ["品牌", "容量"], "watch": ["品牌", "表带"]}
    items, pairs = [], []
    for i in range(30):
        cate = "coffee" if i % 2 == 0 else "watch"
        pv = "#;#".join(f"{k}#:#{rng.choice(['a', 'b'])}" for k in cates[cate])
        items.append({"item_id": f"i{i}", "cate_name": cate, "cate_id": cate,
                      "industry_name": "ind", "title": f"商品{i}",
                      "item_pvs": pv, "sku_pvs": ""})
    for i in range(0, 28, 2):
        pairs.append({"src_item_id": f"i{i}", "tgt_item_id": f"i{i + 2}",
                      "item_label": str(rng.randint(0, 1))})
    with open(raw / "item_info.jsonl", "w", encoding="utf-8") as w:
        for it in items:
            w.write(json.dumps(it, ensure_ascii=False) + "\n")
    with open(raw / "item_train_pair.jsonl", "w") as w:
        for pr in pairs:
            w.write(json.dumps(pr) + "\n")
    # unlabeled test pairs -> prepare emits finetune_test.tsv, the
    # submission prediction target (reference item_test_pair.jsonl)
    with open(raw / "item_test_pair.jsonl", "w") as w:
        for i in range(1, 9, 2):
            w.write(json.dumps({"src_item_id": f"i{i}",
                                "tgt_item_id": f"i{i + 2}",
                                "item_label": "0"}) + "\n")
    # tiny vocab
    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)] + \
        ["[UNK]", "[CLS]", "[SEP]", "[MASK]", ":", ";", "a", "b", "商", "品",
         "牌", "容", "量", "表", "带"] + [str(d) for d in range(10)] + ["<S>"]
    vd = tmp / "vocab"
    vd.mkdir()
    (vd / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    (tmp / "tiny.json").write_text(json.dumps({
        "hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 4,
        "intermediate_size": 64, "max_position_embeddings": 64,
        "hidden_dropout_prob": 0.0}))
    return tmp


def test_cli_help_and_unknown():
    assert main([]) == 0
    assert main(["nope"]) == 2


def test_prepare_finetune_pred_roundtrip(corpus, capsys):
    out = corpus / "processed"
    rc = main(["prepare", "--data_dir", str(corpus / "raw"),
               "--output_dir", str(out), "--valid_proportion", "0.3"])
    assert rc == 0
    files = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(files["train"])

    rc = main([
        "finetune-text", "--data_dir", str(out),
        "--output_dir", str(corpus / "output"),
        "--vocab_path", str(corpus / "vocab"),
        "--model_name", "roberta_tiny",
        "--config_file", str(corpus / "tiny.json"),
        "--max_seq_len", "8", "--max_seq_len_pv", "8",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--epochs", "1", "--learning_rate", "1e-3",
        "--do_train", "--do_eval", "--do_pred", "--threshold", "0.4",
    ])
    assert rc == 0
    out_lines = [json.loads(l)
                 for l in capsys.readouterr().out.strip().splitlines()
                 if l.startswith("{")]
    preds = [o for o in out_lines if "prediction_file" in o]
    # --do_pred targets the TEST split when finetune_test.tsv exists
    assert preds and preds[-1]["prediction_split"] == "test"
    rows = [json.loads(l) for l in open(preds[-1]["prediction_file"])]
    assert len(rows) == 4 and rows[0]["src_item_id"].startswith("i")


def test_pred_with_int8_quant(corpus, capsys):
    """--quant int8 routes the encoder's dense projections through the
    int8 MXU path (ops/quant.py) for prediction runs; the CLI surface must
    produce a well-formed submission file."""
    out = corpus / "processed"
    if not (out / "finetune_train.tsv").exists():
        main(["prepare", "--data_dir", str(corpus / "raw"),
              "--output_dir", str(out), "--valid_proportion", "0.3"])
        capsys.readouterr()
    rc = main([
        "finetune-text", "--data_dir", str(out),
        "--output_dir", str(corpus / "output_int8"),
        "--vocab_path", str(corpus / "vocab"),
        "--model_name", "roberta_tiny",
        "--config_file", str(corpus / "tiny.json"),
        "--max_seq_len", "8", "--max_seq_len_pv", "8",
        "--eval_batch_size", "8", "--quant", "int8",
        "--do_pred", "--threshold", "0.4",
    ])
    assert rc == 0
    out_lines = [json.loads(l)
                 for l in capsys.readouterr().out.strip().splitlines()
                 if l.startswith("{")]
    preds = [o for o in out_lines if "prediction_file" in o]
    rows = [json.loads(l) for l in open(preds[-1]["prediction_file"])]
    probs = [float(r["tgt_item_emb"].strip("[]")) for r in rows]
    assert rows and all(np.isfinite(p) and 0.0 <= p <= 1.0 for p in probs)


def test_mine_embedding_cache_serving(corpus, capsys):
    """`mine` (beyond the reference): encode-once embedding-cache scoring
    of a candidate pair list through the CLI with TRAINED two-tower
    weights (exercises the inner-params-tree restore), int8 cache variant
    included."""
    raw = corpus / "raw"
    out_dir = corpus / "output_tt"
    rc = main([
        "finetune-text", "--data_dir", str(corpus / "processed"),
        "--output_dir", str(out_dir),
        "--vocab_path", str(corpus / "vocab"),
        "--model_name", "roberta_tiny", "--interaction_type", "two_tower",
        "--config_file", str(corpus / "tiny.json"),
        "--max_seq_len", "8", "--max_seq_len_pv", "8",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--epochs", "1", "--do_train", "--do_eval"])
    assert rc == 0
    capsys.readouterr()
    state = (out_dir / "roberta_tiny-v1-two_tower-cls-NA-ce"
             / "best_f1.msgpack")
    assert state.exists()
    for cq in (None, "int8"):
        out = corpus / f"mine_{cq or 'fp'}.jsonl"
        argv = ["mine", "--item_info", str(raw / "item_info.jsonl"),
                "--pairs", str(raw / "item_test_pair.jsonl"),
                "--output", str(out),
                "--vocab_path", str(corpus / "vocab"),
                "--model_name", "roberta_tiny",
                "--config_file", str(corpus / "tiny.json"),
                "--max_seq_len", "8", "--max_seq_len_pv", "8",
                "--batch_size", "4", "--num_workers", "0",
                "--file_state_dict", str(state)]
        if cq:
            argv += ["--cache_quant", cq]
        assert main(argv) == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["pairs"] == 4
        rows = [json.loads(l) for l in open(out)]
        probs = [float(r["tgt_item_emb"].strip("[]")) for r in rows]
        assert len(rows) == 4
        assert all(np.isfinite(p) and 0.0 <= p <= 1.0 for p in probs)


def test_quant_train_rejected(corpus):
    with pytest.raises(SystemExit):
        main(["finetune-text", "--data_dir", str(corpus / "processed"),
              "--output_dir", str(corpus / "output_int8"),
              "--vocab_path", str(corpus / "vocab"),
              "--model_name", "roberta_tiny",
              "--config_file", str(corpus / "tiny.json"),
              "--quant", "int8", "--do_train"])


def test_pkgm_pretrain_cli(corpus, capsys):
    out = corpus / "processed"
    if not (out / "train2id.txt").exists():
        main(["prepare", "--data_dir", str(corpus / "raw"),
              "--output_dir", str(out)])
        capsys.readouterr()
    rc = main(["pkgm-pretrain", "--data_dir", str(out),
               "--output_dir", str(corpus / "kge"),
               "--model_name", "transe", "--embedding_dim", "16",
               "--batch_size", "16", "--epochs", "3"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["final_loss"])
    assert os.path.exists(corpus / "kge" / "kge_final.npz")


def test_pkgm_pretrain_cli_do_eval(corpus, capsys):
    """--do_eval runs filtered link prediction on valid2id.txt through the
    matmul-expanded pkgm candidate scorers (the reference's optional
    LinkPredictionEvaluator, pkgm_pretrain.py:117-135)."""
    out = corpus / "processed"
    if not (out / "train2id.txt").exists():
        main(["prepare", "--data_dir", str(corpus / "raw"),
              "--output_dir", str(out)])
        capsys.readouterr()
    # the prepare step writes an empty valid split (like the reference);
    # carve a few train triples out as validation
    train = (out / "train2id.txt").read_text().strip("\n").splitlines()
    (out / "valid2id.txt").write_text("\n".join(train[:5]) + "\n")
    rc = main(["pkgm-pretrain", "--data_dir", str(out),
               "--output_dir", str(corpus / "kge_eval"),
               "--model_name", "pkgm", "--embedding_dim", "16",
               "--batch_size", "16", "--epochs", "2", "--do_eval"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["mrr"]) and 0.0 < res["mrr"] <= 1.0
    assert 0.0 <= res["hit10"] <= 1.0


def test_ensemble_cli(corpus, capsys, tmp_path):
    outdir = corpus / "output" / "m1"
    outdir.mkdir(parents=True, exist_ok=True)
    rows = [{"src_item_id": "i0", "src_item_emb": "[0]",
             "tgt_item_id": "i2", "tgt_item_emb": "[0.9]", "threshold": 0.5}]
    with open(outdir / "deepAI_result_threshold=0.4.jsonl", "w") as w:
        for r in rows:
            w.write(json.dumps(r) + "\n")
    rc = main(["ensemble", "--data_dir", str(corpus),
               "--ensemble_strategy", "threshold",
               "--models", json.dumps([["m1", 0.5, 0.8]])])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["pairs"] == 1
    fused = [json.loads(l) for l in open(res["output"])]
    assert abs(float(fused[0]["tgt_item_emb"].strip("[]")) - 0.4) < 1e-9
