"""The round-2 pipeline glue: prepare --only_image / --with_image /
--object_detection, build-graph, and pred-text weight loading — the
artifacts scripts/train.sh steps 6-7/9 consume."""

import json
import os

import numpy as np
import pytest

from item_alignment_tpu.cli import main


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("imggraph")
    raw = tmp / "raw"
    raw.mkdir()
    (raw / "item_images").mkdir()
    rng = np.random.RandomState(0)
    items, pairs = [], []
    for i in range(10):
        items.append({
            "item_id": f"i{i}", "cate_name": "手机", "cate_id": "c1",
            "industry_name": "ind", "title": f"商品{i}",
            "item_pvs": "品牌#:#a#;#容量#:#b", "sku_pvs": "",
            "item_image_name": f"i{i}.jpg"})
        img = rng.randint(0, 255, (48, 48, 3)).astype(np.uint8)
        Image.fromarray(img).save(raw / "item_images" / f"i{i}.jpg")
    for i in range(0, 8):
        pairs.append({"src_item_id": f"i{i}", "tgt_item_id": f"i{i + 1}",
                      "item_label": str(i % 2)})
    with open(raw / "item_info.jsonl", "w", encoding="utf-8") as w:
        for it in items:
            w.write(json.dumps(it, ensure_ascii=False) + "\n")
    with open(raw / "item_train_pair.jsonl", "w") as w:
        for pr in pairs:
            w.write(json.dumps(pr) + "\n")
    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)] + \
        ["[UNK]", "[CLS]", "[SEP]", "[MASK]", ":", ";", "a", "b", "商", "品",
         "牌", "容", "量"] + [str(d) for d in range(10)]
    vd = tmp / "vocab"
    vd.mkdir()
    (vd / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    (tmp / "tiny.json").write_text(json.dumps({
        "hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 4,
        "intermediate_size": 64, "max_position_embeddings": 64,
        "hidden_dropout_prob": 0.0}))
    return tmp


@pytest.fixture()
def tiny_nfnet_registry():
    import item_alignment_tpu.models.image as im

    orig = dict(im.BACKBONES)
    im.BACKBONES["nfnet"] = lambda c: im.NFNet(
        depths=(1,), channels=(16,), group_size=8, stem_chs=16, feat_mult=1.0)
    yield
    im.BACKBONES.update(orig)


def test_prepare_only_image_writes_shards(corpus, capsys):
    rc = main(["prepare", "--data_dir", str(corpus / "raw"),
               "--output_dir", str(corpus / "image_shards"),
               "--only_image", "--dtypes", "train", "--image_size", "32",
               "--shard_size", "4"])
    assert rc == 0
    written = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(written["train"]) == 2  # 8 pairs / shard_size 4
    from item_alignment_tpu.data.images import read_image_shards

    shard = next(read_image_shards(written["train"]))
    assert shard["images_1"].shape == (4, 32, 32, 3)
    assert shard["images_1"].dtype == np.uint8  # post-transform uint8
    # (4x smaller; the towers normalize uint8 on-device)
    assert str(shard["pair_ids"][0]).count("|") == 1


def test_prepare_object_detection_crops(corpus, capsys, tmp_path):
    boxes_file = tmp_path / "boxes.jsonl"
    # i0 gets a whitelisted large box ('手机' -> cell phone); i1 a tiny one
    with open(boxes_file, "w") as w:
        w.write(json.dumps({"item_id": "i0",
                            "boxes": [[4, 4, 40, 40, "cell phone", 0.9]]}) + "\n")
        w.write(json.dumps({"item_id": "i1",
                            "boxes": [[0, 0, 5, 5, "cell phone", 0.9]]}) + "\n")
    out = tmp_path / "det"
    rc = main(["prepare", "--data_dir", str(corpus / "raw"),
               "--output_dir", str(out), "--only_image",
               "--object_detection", "--boxes_file", str(boxes_file)])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["cropped"] == 1 and stats["copied"] == 9
    from PIL import Image

    cropped = np.asarray(Image.open(out / "item_images_cropped" / "i0.jpg"))
    original = np.asarray(Image.open(corpus / "raw" / "item_images" / "i0.jpg"))
    assert cropped.shape[0] < original.shape[0]  # actually cropped
    uncropped = np.asarray(Image.open(out / "item_images_cropped" / "i1.jpg"))
    assert uncropped.shape == original.shape


def test_prepare_with_image_dumps_and_threads_embeddings(
        corpus, capsys, tmp_path, tiny_nfnet_registry):
    # finetuned-backbone path: save a tiny ImageTwoTower params msgpack
    import jax
    import jax.numpy as jnp

    from flax import serialization

    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.image import ImageTwoTower

    cfg = ModelConfig(model_name="eca_nfnet_l0", image_model_name="eca_nfnet_l0")
    model = ImageTwoTower(cfg)
    imgs = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, imgs)
    ckpt = tmp_path / "img.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, params["params"])))

    # cropped-images dir is where the reference reads from; reuse originals
    os.symlink(corpus / "raw" / "item_images",
               corpus / "raw" / "item_images_cropped")
    out = tmp_path / "processed_image"
    rc = main(["prepare", "--data_dir", str(corpus / "raw"),
               "--output_dir", str(out), "--with_image",
               "--cv_model_name", "eca_nfnet_l0", "--image_size", "32",
               "--finetuned", "--file_state_dict", str(ckpt),
               "--valid_proportion", "0.25"])
    assert rc == 0
    files = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    emb = json.load(open(out / "image_embedding.json"))
    assert len(emb) == 10 and len(emb["i0"]) == 16  # feat_mult 1.0 * 16
    # TSVs carry the 9-column image layout
    row = open(files["train"], encoding="utf-8").readline().rstrip("\n").split("\t")
    assert len(row) == 9
    np.testing.assert_allclose([float(x) for x in row[4].split(",")],
                               emb[row[1]], rtol=1e-4)

    # refusal without weights (fresh output dir so no cached json)
    with pytest.raises(SystemExit):
        main(["prepare", "--data_dir", str(corpus / "raw"),
              "--output_dir", str(tmp_path / "nope"), "--with_image"])


def test_build_graph_and_finetune_graph(corpus, capsys, tmp_path):
    processed = corpus / "processed"
    if not (processed / "entity2id.txt").exists():
        main(["prepare", "--data_dir", str(corpus / "raw"),
              "--output_dir", str(processed)])
        capsys.readouterr()
    rc = main(["build-graph", "--item_info",
               str(corpus / "raw" / "item_info.jsonl"),
               "--entity2id", str(processed / "entity2id.txt"),
               "--train_pairs", str(corpus / "raw" / "item_train_pair.jsonl"),
               "--output_dir", str(tmp_path), "--valid_proportion", "0.25"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_items"] == 10
    ez = np.load(tmp_path / "edges.npz")
    ei, ew = ez["edge_index"], ez["edge_weight"]
    n = int(ez["n_nodes"])
    # symmetric (plus self loops from normalization)
    pairs = set(map(tuple, ei.T.tolist()))
    for s, d in list(pairs):
        assert (d, s) in pairs
    # normalized: total weight into each node is finite and positive
    assert ew.min() > 0 and np.isfinite(ew).all()
    # pair files carry usable indices
    rows = [json.loads(l) for l in
            open(tmp_path / "item_train_train_pair.jsonl", encoding="utf-8")]
    assert rows and all(0 <= r["src_idx"] < n for r in rows)
    assert stats["item_train_valid_pair.jsonl"] == 2

    # the produced artifacts feed finetune-graph end-to-end
    feats = np.random.RandomState(0).randn(n, 8).astype(np.float32)
    np.save(tmp_path / "feats.npy", feats)
    rc = main(["finetune-graph", "--feature_matrix", str(tmp_path / "feats.npy"),
               "--edges", str(tmp_path / "edges.npz"),
               "--train_pairs", str(tmp_path / "item_train_train_pair.jsonl"),
               "--valid_pairs", str(tmp_path / "item_train_valid_pair.jsonl"),
               "--output_dir", str(tmp_path / "gcn"), "--gcn_hidden", "8",
               "--gcn_layers", "2", "--epochs", "2", "--batch_size", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["final_loss"])

    # --scan_layers (train.sh step 9's reference-scale recipe: the
    # unrolled compile never finished through the remote relay) plumbs
    # through the CLI and still trains
    rc = main(["finetune-graph", "--feature_matrix", str(tmp_path / "feats.npy"),
               "--edges", str(tmp_path / "edges.npz"),
               "--train_pairs", str(tmp_path / "item_train_train_pair.jsonl"),
               "--output_dir", str(tmp_path / "gcn_scan"), "--gcn_hidden", "8",
               "--gcn_layers", "2", "--epochs", "2", "--batch_size", "4",
               "--scan_layers", "--edge_chunk", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["final_loss"])


def test_pred_text_requires_and_loads_weights(corpus, capsys, tmp_path):
    processed = corpus / "processed"
    if not (processed / "entity2id.txt").exists():
        main(["prepare", "--data_dir", str(corpus / "raw"),
              "--output_dir", str(processed)])
        capsys.readouterr()
    base = ["pred-text", "--entity2id", str(processed / "entity2id.txt"),
            "--item_info", str(corpus / "raw" / "item_info.jsonl"),
            "--vocab_path", str(corpus / "vocab"),
            "--config_file", str(corpus / "tiny.json"),
            "--max_seq_len", "8", "--batch_size", "8"]
    # 1) refuses random weights
    with pytest.raises(SystemExit, match="random weights"):
        main(base + ["--output", str(tmp_path / "f.npy")])

    # 2) loads a finetuned msgpack and the weights change the features
    import jax
    import jax.numpy as jnp

    from flax import serialization

    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    from item_alignment_tpu.data.tokenization import load_text_tokenizer

    tok = load_text_tokenizer(str(corpus / "vocab"))
    cfg = ModelConfig.from_json(str(corpus / "tiny.json"), vocab_size=len(tok))
    model = RobertaOneTower(cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(7)}, ids,
                                 jnp.ones((2, 8), jnp.int32))
    ckpt = tmp_path / "text.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, params["params"])))

    rc = main(base + ["--output", str(tmp_path / "a.npy"),
                      "--file_state_dict", str(ckpt)])
    assert rc == 0
    rc = main(base + ["--output", str(tmp_path / "b.npy"),
                      "--allow_random_weights"])
    assert rc == 0
    a, b = np.load(tmp_path / "a.npy"), np.load(tmp_path / "b.npy")
    n_ents = sum(1 for _ in open(processed / "entity2id.txt"))
    assert a.shape == (n_ents, 32)
    assert not np.allclose(a, b)  # the checkpoint actually loaded

def test_pred_text_parallel_tokenization_matches_serial(corpus, capsys,
                                                        tmp_path):
    """--num_workers spawns tokenizer processes; the feature matrix must be
    identical to the serial path (the 258k-entity matrix is tokenization-
    bound without this)."""
    processed = corpus / "processed"
    if not (processed / "entity2id.txt").exists():
        main(["prepare", "--data_dir", str(corpus / "raw"),
              "--output_dir", str(processed)])
        capsys.readouterr()
    base = ["pred-text", "--entity2id", str(processed / "entity2id.txt"),
            "--item_info", str(corpus / "raw" / "item_info.jsonl"),
            "--vocab_path", str(corpus / "vocab"),
            "--config_file", str(corpus / "tiny.json"),
            "--max_seq_len", "8", "--batch_size", "4",
            "--allow_random_weights"]
    assert main(base + ["--output", str(tmp_path / "ser.npy"),
                        "--num_workers", "0"]) == 0
    assert main(base + ["--output", str(tmp_path / "par.npy"),
                        "--num_workers", "2"]) == 0
    ser = np.load(tmp_path / "ser.npy")
    par = np.load(tmp_path / "par.npy")
    np.testing.assert_array_equal(ser, par)


def test_pred_text_no_implicit_host_to_device(corpus, capsys, tmp_path):
    """Every host->device crossing in pred-text's encode loop must be
    explicit (device_put / jnp.array).  Numpy params passed straight into
    the jitted encode are re-uploaded per dispatch — ~1.3GB of fp32
    through the remote tunnel per group at reference scale, which OOMed
    the host in the round-5 rehearsal.  --xfer_guard wraps the loop in
    jax.transfer_guard_host_to_device("disallow")."""
    processed = corpus / "processed"
    if not (processed / "entity2id.txt").exists():
        main(["prepare", "--data_dir", str(corpus / "raw"),
              "--output_dir", str(processed)])
        capsys.readouterr()
    rc = main(["pred-text", "--entity2id", str(processed / "entity2id.txt"),
               "--item_info", str(corpus / "raw" / "item_info.jsonl"),
               "--vocab_path", str(corpus / "vocab"),
               "--config_file", str(corpus / "tiny.json"),
               "--max_seq_len", "8", "--batch_size", "4",
               "--num_workers", "0", "--allow_random_weights",
               "--xfer_guard", "--output", str(tmp_path / "g.npy")])
    assert rc == 0
    assert np.load(tmp_path / "g.npy").shape[1] == 32


def test_pred_text_scan_chunks_matches_per_batch(corpus, capsys, tmp_path):
    """K-batches-per-dispatch (lax.scan) must produce the same matrix as
    one batch per dispatch, including tail padding."""
    processed = corpus / "processed"
    if not (processed / "entity2id.txt").exists():
        main(["prepare", "--data_dir", str(corpus / "raw"),
              "--output_dir", str(processed)])
        capsys.readouterr()
    base = ["pred-text", "--entity2id", str(processed / "entity2id.txt"),
            "--item_info", str(corpus / "raw" / "item_info.jsonl"),
            "--vocab_path", str(corpus / "vocab"),
            "--config_file", str(corpus / "tiny.json"),
            "--max_seq_len", "8", "--batch_size", "3", "--num_workers", "0",
            "--allow_random_weights"]
    assert main(base + ["--output", str(tmp_path / "k1.npy"),
                        "--scan_chunks", "1"]) == 0
    assert main(base + ["--output", str(tmp_path / "k4.npy"),
                        "--scan_chunks", "4"]) == 0
    k1 = np.load(tmp_path / "k1.npy")
    k4 = np.load(tmp_path / "k4.npy")
    n_ents = sum(1 for _ in open(processed / "entity2id.txt"))
    assert k1.shape[0] == n_ents
    np.testing.assert_allclose(k1, k4, rtol=0, atol=1e-6)
