"""Native C++ data-loader: build, parity with Python reader, pack kernel."""

import os
import time

import numpy as np
import pytest

from item_alignment_tpu.data import native_loader as NL


@pytest.fixture(scope="module")
def lib():
    lib = NL.get_lib()
    if lib is None:
        pytest.skip("no compiler / native build failed")
    return lib


def _write_tsv(path, rows):
    with open(path, "w", encoding="utf-8") as w:
        for r in rows:
            w.write("\t".join(r) + "\n")


def test_tsv_index_counts(lib, tmp_path):
    rows = [("1", "a", "红色咖啡机"), ("0", "b", "x\ty".replace("\t", " "))]
    p = tmp_path / "t.tsv"
    _write_tsv(str(p), rows)
    starts, ends, counts = NL.tsv_index(str(p))
    assert counts.tolist() == [3, 3]
    assert len(starts) == 6


def test_read_tsv_fast_matches_python(lib, tmp_path):
    rows = [("1", "i01", "商品 标题", "品牌:acme;容量:12", "i02", "t", "p"),
            ("0", "i03", "x", "", "i04", "y", "品牌:z")]
    p = tmp_path / "pairs.tsv"
    _write_tsv(str(p), rows)
    fast = NL.read_tsv_fast(str(p))
    with open(p, encoding="utf-8") as f:
        slow = [tuple(l.rstrip("\n").split("\t")) for l in f if l.strip()]
    assert fast == slow


def test_read_tsv_fast_large_parity_and_speed(lib, tmp_path):
    rs = np.random.RandomState(0)
    rows = [("%d" % (i % 2), f"id{i}", "商品" * 10,
             ";".join(f"k{j}:v{rs.randint(100)}" for j in range(8)),
             f"id{i+1}", "商品" * 10, "k:v")
            for i in range(20000)]
    p = tmp_path / "big.tsv"
    _write_tsv(str(p), rows)
    t0 = time.time()
    fast = NL.read_tsv_fast(str(p))
    t_fast = time.time() - t0
    assert len(fast) == 20000
    assert fast[7] == rows[7]
    assert NL.count_lines(str(p)) == 20000
    # sanity perf bound: shouldn't be pathologically slow
    assert t_fast < 10.0




def test_prepare_reader_uses_native(tmp_path, lib):
    from item_alignment_tpu.data.prepare import read_finetune_tsv

    rows = [("1", "a", "ta", "k:v", "b", "tb", "k:w")]
    p = tmp_path / "ft.tsv"
    _write_tsv(str(p), rows)
    out = read_finetune_tsv(str(p))
    assert out[0][0] == "1" and out[0][1] == "a" and out[0][5] == "b"


def test_format_rows_fp32_roundtrip(lib):
    rs = np.random.RandomState(0)
    mat = np.concatenate([
        rs.randn(7, 5).astype(np.float32) * 1e3,
        np.array([[0, -0, 1e-38, 3.4e38, 1.5, -2.25, 1 / 3, 7e-20, 1, -1]],
                 np.float32).reshape(2, 5),
    ]).astype(np.float32)
    texts = NL.format_rows(mat)
    assert texts is not None and len(texts) == len(mat)
    back = np.array([[np.float32(v) for v in t.split(",")] for t in texts],
                    np.float32)
    # %.9g round-trips every fp32 exactly
    np.testing.assert_array_equal(back, mat)


def test_embedding_json_roundtrip(lib, tmp_path):
    from item_alignment_tpu.data.images import write_embedding_json

    mat = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    ids = ["a", "b-1", "商品", "d"]
    texts = NL.format_rows(mat)
    path = tmp_path / "emb.json"
    write_embedding_json(ids, texts, str(path))
    # the file is real JSON
    import json
    loaded = json.loads(path.read_text(encoding="utf-8"))
    assert list(loaded) == ids
    np.testing.assert_array_equal(
        np.array(loaded["a"], np.float32), mat[0])
    # the native span reader slices the same texts back without parsing
    spans = NL.read_embedding_spans(str(path))
    assert spans == list(zip(ids, texts))


def test_embedding_spans_reads_reference_style_dump(lib, tmp_path):
    # json.dump writes ", "-separated values and a space after ':'
    import json
    path = tmp_path / "ref.json"
    data = {"x1": [0.25, -1.5, 3.0], "x2": [1e-3, 2.0, 0.125]}
    path.write_text(json.dumps(data), encoding="utf-8")
    spans = NL.read_embedding_spans(str(path))
    assert spans is not None
    emb = dict(spans)
    assert emb["x1"] == "0.25,-1.5,3.0"
    assert [np.float32(v) for v in emb["x2"].split(",")] == [
        np.float32(1e-3), np.float32(2.0), np.float32(0.125)]


def test_embedding_spans_bails_on_surprising_json(lib, tmp_path):
    # escaped key and nested values are out of contract -> None (callers
    # fall back to json.load), never a wrong parse
    p1 = tmp_path / "esc.json"
    p1.write_text('{"a\\"b": [1.0]}', encoding="utf-8")
    assert NL.read_embedding_spans(str(p1)) is None
    p2 = tmp_path / "nest.json"
    p2.write_text('{"a": [[1.0]]}', encoding="utf-8")
    assert NL.read_embedding_spans(str(p2)) is None


def test_format_rows_max_width_values(lib):
    # every value renders at the %.9g maximum width (15 chars); the
    # staging-buffer sizing must still leave the native side's 32-byte
    # pre-value headroom (regression: a tail chunk of max-width values
    # returned -1)
    mat = np.full((1, 2304), np.float32(-1.17549435e-38))
    texts = NL.format_rows(mat)
    assert texts is not None
    back = np.array([np.float32(v) for v in texts[0].split(",")], np.float32)
    np.testing.assert_array_equal(back, mat[0])


def test_format_rows_nonfinite_json_compatible(lib, tmp_path):
    from item_alignment_tpu.data.images import write_embedding_json
    import json
    mat = np.array([[np.nan, np.inf, -np.inf, 1.5]], np.float32)
    texts = NL.format_rows(mat)
    assert texts == ["NaN,Infinity,-Infinity,1.5"]
    # json.load (the no-compiler fallback reader) parses the dump
    path = tmp_path / "nf.json"
    write_embedding_json(["a"], texts, str(path))
    loaded = json.loads(path.read_text())
    assert np.isnan(loaded["a"][0]) and np.isinf(loaded["a"][1])


def test_embedding_texts_from_mapping_ragged(lib):
    from item_alignment_tpu.data.images import embedding_texts_from_mapping
    out = embedding_texts_from_mapping({"a": [1.0, 2.0], "b": [3.0]})
    assert out == {"a": "1,2", "b": "3"}
    assert embedding_texts_from_mapping({}) == {}
