"""ctypes binding for the native async checkpoint writer (native/ckptio.cpp).

`AsyncCheckpointWriter` enqueues flattened state pytrees to a C++ worker
thread that serializes them as uncompressed .npz (np.load-compatible), so
restart IO overlaps the simulation — the checkpoint analogue of the history
writer (utils/histio_native.py), playing the reference's PIO restart role
(SURVEY §5.4). Falls back transparently to synchronous np.savez when the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess

import jax
import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libckptio.so"))


def build_native(force: bool = False) -> bool:
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ckptio_create.restype = ctypes.c_void_p
    lib.ckptio_write.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_void_p)]
    lib.ckptio_flush.argtypes = [ctypes.c_void_p]
    lib.ckptio_pending.argtypes = [ctypes.c_void_p]
    lib.ckptio_pending.restype = ctypes.c_int
    lib.ckptio_destroy.argtypes = [ctypes.c_void_p]
    return lib


class AsyncCheckpointWriter:
    """Queue checkpoint writes to the native worker (falls back to np.savez).

    The same on-disk layout as utils/checkpoint.py (state.npz of leaf_i
    arrays + meta.json), so `restore_checkpoint` reads either producer.
    Call `flush()` before handing a checkpoint path to a reader."""

    def __init__(self, try_native: bool = True):
        self._lib = _load() if (try_native and build_native()) else None
        self._h = self._lib.ckptio_create() if self._lib else None

    @property
    def native(self) -> bool:
        return self._h is not None

    def write(self, path: str, state, meta: dict | None = None) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta or {}, f)
        # note: np.ascontiguousarray would promote 0-D arrays (the step
        # counter) to shape (1,), breaking the restart shape contract —
        # asarray(order="C") preserves rank
        leaves = [np.asarray(leaf, order="C")
                  for leaf in jax.tree.leaves(state)]
        npz = os.path.join(path, "state.npz")
        if self._h is None:
            np.savez(npz, **{f"leaf_{i}": a for i, a in enumerate(leaves)})
            return
        n = len(leaves)
        names = (ctypes.c_char_p * n)(
            *[f"leaf_{i}".encode() for i in range(n)])
        dts = (ctypes.c_char_p * n)(*[a.dtype.str.encode() for a in leaves])
        nds = (ctypes.c_int * n)(*[a.ndim for a in leaves])
        flat_shape: list[int] = []
        for a in leaves:
            flat_shape += list(a.shape)
        shps = (ctypes.c_int64 * len(flat_shape))(*flat_shape)
        datas = (ctypes.c_void_p * n)(
            *[a.ctypes.data_as(ctypes.c_void_p).value for a in leaves])
        # the C side copies synchronously inside the call; keep the batch
        # alive through it anyway
        self._keepalive = leaves
        self._lib.ckptio_write(self._h, npz.encode(), n, names, dts, nds,
                               shps, datas)

    def pending(self) -> int:
        return self._lib.ckptio_pending(self._h) if self._h else 0

    def flush(self) -> None:
        if self._h:
            self._lib.ckptio_flush(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.ckptio_destroy(self._h)
            self._h = None
