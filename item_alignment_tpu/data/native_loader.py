"""ctypes bindings for the native data-loading kernels (native/ia_data.cpp).

Compiles the shared library on first use (g++, cached next to the source);
every entry point has a pure-Python fallback so the framework works without
a compiler.  ``read_tsv_fast`` is the accelerated version of the TSV scan
behind ``prepare.read_finetune_tsv``.
"""

from __future__ import annotations

import ctypes
import mmap
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from item_alignment_tpu.utils import logger

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "ia_data.cpp")
_SO = os.path.join(_NATIVE_DIR, "libia_data.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, text=True)
        return _SO
    except Exception as e:  # compiler missing / failed
        logger.warning(f"native build failed ({e}); using Python fallback")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _build() if os.path.exists(_SRC) else None
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.tsv_index.restype = ctypes.c_int64
    lib.tsv_index.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.count_char.restype = ctypes.c_int64
    lib.count_char.argtypes = [ctypes.c_char_p, ctypes.c_char]
    lib.format_float_rows.restype = ctypes.c_int64
    lib.format_float_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.emb_json_spans.restype = ctypes.c_int64
    lib.emb_json_spans.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return _lib


def tsv_index(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(field_starts, field_ends, field_counts-per-line), byte offsets."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    n_lines = ctypes.c_int64()
    n_fields = ctypes.c_int64()
    rc = lib.tsv_index(path.encode(), ctypes.byref(n_lines),
                       ctypes.byref(n_fields), None, None, None)
    assert rc == 0, f"tsv_index failed: {rc}"
    starts = np.empty(n_fields.value, np.int64)
    ends = np.empty(n_fields.value, np.int64)
    counts = np.empty(n_lines.value, np.int64)
    rc = lib.tsv_index(path.encode(), ctypes.byref(n_lines),
                       ctypes.byref(n_fields),
                       starts.ctypes.data_as(ctypes.c_void_p),
                       ends.ctypes.data_as(ctypes.c_void_p),
                       counts.ctypes.data_as(ctypes.c_void_p))
    assert rc == 0, f"tsv_index failed: {rc}"
    return starts, ends, counts


def read_tsv_fast(path: str) -> List[Tuple[str, ...]]:
    """Accelerated TSV reader: native offset scan + mmap slicing; pure-
    Python fallback when the native lib is unavailable."""
    if get_lib() is None or os.path.getsize(path) == 0:
        with open(path, encoding="utf-8") as f:
            return [tuple(line.rstrip("\n").split("\t")) for line in f
                    if line.strip()]
    starts, ends, counts = tsv_index(path)
    rows: List[Tuple[str, ...]] = []
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            idx = 0
            for c in counts:
                fields = tuple(
                    mm[starts[idx + j]:ends[idx + j]].decode("utf-8")
                    for j in range(int(c)))
                idx += int(c)
                if len(fields) > 1 or (fields and fields[0]):
                    rows.append(fields)
        finally:
            mm.close()
    return rows


def format_rows(mat: np.ndarray, sep: str = ",",
                chunk: int = 4096) -> Optional[List[str]]:
    """[n, d] floats -> ["v,v,...", ...] ASCII rows (%.9g, fp32
    round-trip exact) through the native formatter; None when the native
    lib is unavailable (callers fall back to Python formatting).  Chunked
    so the staging buffer stays ~150 MB at embedding widths."""
    lib = get_lib()
    if lib is None:
        return None
    mat = np.ascontiguousarray(mat, np.float32)
    if mat.ndim != 2:
        raise ValueError(f"expected [n, d], got {mat.shape}")
    n, d = mat.shape
    out: List[str] = []
    for i in range(0, n, chunk):
        sub = np.ascontiguousarray(mat[i:i + chunk])
        # 16 bytes covers any %.9g value + separator; +64 keeps the
        # native side's 32-byte pre-value headroom check satisfied even
        # when every value in the chunk is max width
        cap = int(sub.size) * 16 + 64
        buf = np.empty(cap, np.uint8)
        ends = np.empty(len(sub), np.int64)
        total = lib.format_float_rows(
            sub.ctypes.data_as(ctypes.c_void_p), len(sub), d,
            sep.encode()[:1], buf.ctypes.data_as(ctypes.c_void_p), cap,
            ends.ctypes.data_as(ctypes.c_void_p))
        if total < 0:  # real exception: asserts vanish under python -O
            raise RuntimeError(f"format_float_rows failed: {total}")
        raw = buf[:total].tobytes()
        start = 0
        for e in ends:
            out.append(raw[start:int(e)].decode("ascii"))
            start = int(e)
    return out


def read_embedding_spans(path: str) -> Optional[List[Tuple[str, str]]]:
    """Offset-scan an ``{"id": [floats...]}`` JSON map and return
    [(id, "v,v,...")] with the array text sliced verbatim (spaces
    stripped, so reference-written ", "-separated dumps normalize to the
    TSV embedding form).  None -> caller should json.load instead (native
    lib unavailable, or the file has escapes/nesting the scanner refuses).
    """
    lib = get_lib()
    if lib is None or os.path.getsize(path) == 0:
        return None
    n = ctypes.c_int64()
    rc = lib.emb_json_spans(path.encode(), ctypes.byref(n),
                            None, None, None, None)
    if rc != 0:
        logger.warning(f"emb_json_spans({path}) -> {rc}; using json.load")
        return None
    ks = np.empty(n.value, np.int64)
    ke = np.empty(n.value, np.int64)
    vs = np.empty(n.value, np.int64)
    ve = np.empty(n.value, np.int64)
    rc = lib.emb_json_spans(path.encode(), ctypes.byref(n),
                            ks.ctypes.data_as(ctypes.c_void_p),
                            ke.ctypes.data_as(ctypes.c_void_p),
                            vs.ctypes.data_as(ctypes.c_void_p),
                            ve.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    out: List[Tuple[str, str]] = []
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            for i in range(n.value):
                key = mm[ks[i]:ke[i]].decode("utf-8")
                val = mm[vs[i]:ve[i]].decode("ascii")
                if " " in val or "\n" in val:
                    val = "".join(val.split())
                out.append((key, val))
        finally:
            mm.close()
    return out


def count_lines(path: str) -> int:
    lib = get_lib()
    if lib is None:
        with open(path, "rb") as f:
            return sum(1 for _ in f)
    return int(lib.count_char(path.encode(), b"\n"))

# NB: a native pack_rows (batch row gather for the batcher) existed here
# and was removed after measurement: numpy fancy indexing over the same
# 65k x 512 int32 matrix is ~2x faster than the ctypes round trip.
