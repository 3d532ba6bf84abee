"""ctypes binding to the native async batch assembler
(native/batch_loader.cpp).

The reference feeds training from torch DataLoaders whose native worker
pool collates batches off the training thread
(sotasum/data_modules.py:287-321). The TPU build's equivalent: the
tokenized dataset is a dict of fixed-shape row-major numpy arrays, and a
C++ worker thread gathers shuffled rows into a ring of preallocated
batch buffers, so host-side batch assembly overlaps device execution.

Falls back loudly (raises) if the shared library cannot be built; the
pipeline catches this once and uses the pure-Python gather.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import weakref
from typing import Iterator

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libbatch_loader.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.batch_loader_create.restype = ctypes.c_void_p
    lib.batch_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.batch_loader_n_batches.restype = ctypes.c_int64
    lib.batch_loader_n_batches.argtypes = [ctypes.c_void_p]
    lib.batch_loader_next.restype = ctypes.c_int32
    lib.batch_loader_next.argtypes = [ctypes.c_void_p]
    lib.batch_loader_release.restype = None
    lib.batch_loader_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.batch_loader_destroy.restype = None
    lib.batch_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def native_batches(
    examples: dict[str, np.ndarray],
    order: np.ndarray,
    batch_size: int,
    *,
    n_slots: int = 3,
) -> Iterator[dict[str, np.ndarray]]:
    """Return an iterator of batches
    `{k: examples[k][order[i:i+batch_size]]}` assembled by the native
    worker. ``order`` must already be trimmed to a multiple of
    ``batch_size`` (drop_last semantics live in the caller).

    Environment-dependent setup (building/loading the shared library,
    pinning the field pointers) happens HERE, so an unusable toolchain
    raises at call time — before the caller has consumed any batch.

    Yielded arrays are fresh copies of the ring-slot contents: the slot
    is released back to the worker as soon as the copy is taken, so a
    consumer may retain batches arbitrarily long or hand them to an
    asynchronous device transfer (PJRT does not promise a synchronous
    host-buffer copy) without ever observing a refilled slot.
    """
    lib = _load()
    keys = sorted(examples.keys())
    arrs = [np.ascontiguousarray(examples[k]) for k in keys]
    n_rows = arrs[0].shape[0]
    for a in arrs:
        assert a.shape[0] == n_rows

    field_ptrs = (ctypes.c_void_p * len(arrs))(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs]
    )
    row_nbytes = (ctypes.c_int64 * len(arrs))(
        *[a.strides[0] if a.ndim > 1 else a.itemsize for a in arrs]
    )
    order = np.ascontiguousarray(order, dtype=np.int64)
    assert len(order) % batch_size == 0

    # slot buffers owned by numpy (laid out [slot][field])
    slots = [
        [
            np.empty((batch_size,) + a.shape[1:], dtype=a.dtype)
            for a in arrs
        ]
        for _ in range(n_slots)
    ]
    slot_ptrs = (ctypes.c_void_p * (n_slots * len(arrs)))(
        *[
            b.ctypes.data_as(ctypes.c_void_p).value
            for slot in slots
            for b in slot
        ]
    )

    # create BEFORE returning the generator so a failure raises at call
    # time, inside pipeline.batches' creation-only fallback guard — not
    # on first next() mid-epoch
    handle = lib.batch_loader_create(
        field_ptrs, row_nbytes, len(arrs), n_rows,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(order),
        batch_size, n_slots, slot_ptrs,
    )
    if not handle:
        raise RuntimeError("batch_loader_create failed (bad arguments)")

    destroyed = []

    def _destroy():
        # once-guard: reached via the generator's finally AND the
        # finalizer below
        if not destroyed:
            destroyed.append(True)
            lib.batch_loader_destroy(handle)  # joins the worker thread

    def _run():
        # `arrs`/`order`/`slots` are closed over, keeping every buffer the
        # C++ worker touches alive for the generator's lifetime.
        try:
            n_batches = lib.batch_loader_n_batches(handle)
            for _ in range(n_batches):
                slot = lib.batch_loader_next(handle)
                if slot < 0:
                    break
                batch = {k: slots[slot][f].copy() for f, k in enumerate(keys)}
                lib.batch_loader_release(handle, slot)
                yield batch
        finally:
            _destroy()

    gen = _run()
    # the worker starts at create: if the caller drops the generator
    # without ever starting it, its finally never runs — the finalizer
    # destroys (join) first and only then releases the buffer refs it
    # pins (the callback holds them until it fires)
    weakref.finalize(
        gen,
        lambda _pin=(arrs, order, slots, field_ptrs, row_nbytes,
                     slot_ptrs): _destroy(),
    )
    return gen
