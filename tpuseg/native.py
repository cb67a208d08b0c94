"""ctypes bindings for the native C++ sparsity library (native/sparsity.cpp).

The library accelerates host-side mask generation and BSR packing; every
entry point has a pure-numpy fallback in tpuseg.sparsity, and parity is
tested in tests/test_native.py.  Build (once):

    python -m tpuseg.native_build

``lib()`` returns None when the shared object is absent so callers can fall
back silently.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SO_NAME = "libtpuseg_sparsity.so"
_CACHE: dict = {}


def so_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "native", _SO_NAME)


def lib():
    if "lib" in _CACHE:
        return _CACHE["lib"]
    path = so_path()
    if not os.path.exists(path):
        _CACHE["lib"] = None
        return None
    L = ctypes.CDLL(path)
    i64 = ctypes.c_int64
    f64 = ctypes.c_double
    L.block_abs_sums.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C"), i64, i64, i64, i64,
        np.ctypeslib.ndpointer(np.float64, flags="C"),
    ]
    L.prune_block_mask.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C"), i64, i64, i64, i64, f64,
        np.ctypeslib.ndpointer(np.float32, flags="C"),
    ]
    L.rmb_prune.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C"), i64, i64, i64, i64, f64,
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"), i64,
        np.ctypeslib.ndpointer(np.float32, flags="C"),
    ]
    L.bsr_pack.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C"), i64, i64, i64, i64,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.float32, flags="C"),
    ]
    L.bsr_pack.restype = i64
    _CACHE["lib"] = L
    return L


def available() -> bool:
    return lib() is not None


def block_abs_sums(mat: np.ndarray, bh: int, bw: int) -> np.ndarray:
    L = lib()
    rows, cols = mat.shape
    nrb, ncb = -(-rows // bh), -(-cols // bw)
    out = np.zeros((nrb, ncb), np.float64)
    L.block_abs_sums(np.ascontiguousarray(mat, np.float32), rows, cols, bh, bw, out)
    return out


def prune_block_mask(mat: np.ndarray, bh: int, bw: int, sparsity: float) -> np.ndarray:
    L = lib()
    rows, cols = mat.shape
    mask = np.zeros((rows, cols), np.float32)
    L.prune_block_mask(
        np.ascontiguousarray(mat, np.float32), rows, cols, bh, bw, sparsity, mask
    )
    return mask


def rmb_prune(mat: np.ndarray, bh: int, bw: int, spo: float,
              bl_types, bl_counts) -> np.ndarray:
    L = lib()
    rows, cols = mat.shape
    m = np.ascontiguousarray(mat, np.float32).copy()
    mask = np.zeros((rows, cols), np.float32)
    bh_arr = np.asarray([t.bh for t in bl_types], np.int64)
    bw_arr = np.asarray([t.bw for t in bl_types], np.int64)
    cnt = np.asarray(bl_counts, np.int64)
    L.rmb_prune(m, rows, cols, bh, bw, spo, bh_arr, bw_arr, cnt, len(bl_types), mask)
    return mask


def bsr_pack(wm: np.ndarray, bm: int, bk: int):
    L = lib()
    rows, cols = wm.shape
    nrb, ncb = rows // bm, cols // bk
    rowptr = np.zeros(nrb + 1, np.int32)
    colidx = np.zeros(nrb * ncb, np.int32)
    vals = np.zeros((nrb * ncb, bm, bk), np.float32)
    nnzb = L.bsr_pack(
        np.ascontiguousarray(wm, np.float32), rows, cols, bm, bk,
        rowptr, colidx, vals.reshape(-1),
    )
    return vals[:nnzb], rowptr, colidx[:nnzb]
