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
