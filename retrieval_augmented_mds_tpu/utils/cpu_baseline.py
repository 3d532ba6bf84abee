"""ctypes binding to the native C++ CPU MIPS baseline (native/cpu_mips.cpp).

Compiled on demand with the in-image g++. This is the framework's FAISS
IndexFlat{IP,L2} equivalent for host-side use: benchmark denominator and an
independent test oracle (FAISS itself is not in the image)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libcpu_mips.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    for name in ("mips_search_f32", "l2_search_f32"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
    _lib = lib
    return lib


def cpu_mips_search(
    corpus: np.ndarray, queries: np.ndarray, k: int, metric: str = "ip"
):
    """Exact CPU top-k. Returns (values [B, k] f32, indices [B, k] int32)."""
    lib = _load()
    corpus = np.ascontiguousarray(corpus, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    n, d = corpus.shape
    b, d2 = queries.shape
    assert d == d2
    out_vals = np.empty((b, k), np.float32)
    out_idx = np.empty((b, k), np.int32)
    fn = lib.mips_search_f32 if metric == "ip" else lib.l2_search_f32
    fn(
        corpus.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int32(d),
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(b), ctypes.c_int32(k),
        out_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_vals, out_idx
