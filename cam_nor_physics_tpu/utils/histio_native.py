"""ctypes binding for the native async history writer (native/histio.cpp).

`AsyncHistoryWriter` enqueues fully-resolved history tapes to a C++ worker
thread so NetCDF serialization overlaps the simulation (the reference's PIO
role). Falls back transparently to the synchronous scipy writer when the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhistio.so"))


def build_native(force: bool = False) -> bool:
    """Build libhistio.so with the repo Makefile; returns success."""
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
    lib.histio_create.restype = ctypes.c_void_p
    lib.histio_write_tape.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.histio_flush.argtypes = [ctypes.c_void_p]
    lib.histio_destroy.argtypes = [ctypes.c_void_p]
    lib.histio_pending.argtypes = [ctypes.c_void_p]
    lib.histio_pending.restype = ctypes.c_int
    return lib


_VDIM_CODE = {"srf": 0, "mid": 1, "int": 2}
_STAGGER_CODE = {"fv_u_stagger": 3, "fv_v_stagger": 4}


class AsyncHistoryWriter:
    """Queue history tapes to the native worker (falls back to scipy)."""

    def __init__(self, registry, lats: np.ndarray, lons: np.ndarray,
                 pver: int, try_native: bool = True):
        self.registry = registry
        self.lats = np.ascontiguousarray(np.degrees(lats), np.float64)
        self.lons = np.ascontiguousarray(np.degrees(lons), np.float64)
        self.lats_rad = np.asarray(lats)
        self.lons_rad = np.asarray(lons)
        self.pver = pver
        self._lib = _load() if (try_native and build_native()) else None
        self._h = self._lib.histio_create() if self._lib else None
        self._keepalive: list = []

    @property
    def native(self) -> bool:
        return self._h is not None

    def write(self, path: str, buf: dict, time_days: float) -> None:
        from .history import history_resolve, write_history_netcdf
        if self._h is None:
            write_history_netcdf(path, self.registry, buf, self.lats_rad,
                                 self.lons_rad, self.pver, time_days)
            return
        vals = history_resolve(self.registry, buf)
        jm, im = len(self.lats), len(self.lons)
        names, units, vdims, datas = [], [], [], []
        for name, val in vals.items():
            fd = self.registry.fields[name]
            if fd.gridname in _STAGGER_CODE:
                rows = jm - 1 if fd.gridname == "fv_u_stagger" else jm
                arr = np.asarray(val, np.float32).reshape(
                    self.pver, rows, im)
                code = _STAGGER_CODE[fd.gridname]
            elif fd.vdim == "srf":
                arr = np.asarray(val, np.float32).reshape(jm, im)
                code = _VDIM_CODE[fd.vdim]
            else:
                nk = self.pver if fd.vdim == "mid" else self.pver + 1
                arr = np.asarray(val, np.float32).T.reshape(nk, jm, im)
                code = _VDIM_CODE[fd.vdim]
            names.append(name.encode())
            units.append(fd.units.encode())
            vdims.append(code)
            datas.append(np.ascontiguousarray(arr))
        n = len(names)
        c_names = (ctypes.c_char_p * n)(*names)
        c_units = (ctypes.c_char_p * n)(*units)
        c_vdims = (ctypes.c_int * n)(*vdims)
        c_data = (ctypes.POINTER(ctypes.c_float) * n)(
            *[d.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
              for d in datas])
        # the C side copies the buffers synchronously inside the call, so no
        # keepalive past the call is required; keep the last batch anyway to
        # be safe against future zero-copy changes
        self._keepalive = datas
        self._lib.histio_write_tape(
            self._h, path.encode(), jm, im, self.pver,
            self.lats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.lons.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            float(time_days), n, c_names, c_units, c_vdims, c_data)

    def pending(self) -> int:
        return self._lib.histio_pending(self._h) if self._h else 0

    def flush(self) -> None:
        if self._h:
            self._lib.histio_flush(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.histio_destroy(self._h)
            self._h = None
