"""ctypes binding for the native data-loading runtime (dataload.cc).

Builds ``libdataload.so`` with g++ on first use (cached next to this
file); callers degrade gracefully to PIL when no toolchain/libpng is
available. The batch API decodes N same-shape PNGs on a C++ thread pool
directly into one numpy buffer — the native replacement for the
reference's DataLoader worker processes (reference config.yml:20).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libdataload.so")
_SRC = os.path.join(_HERE, "dataload.cc")
_BUILD_LOCK = threading.Lock()


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    with _BUILD_LOCK:
        if force or not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            cmd = [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-o", _SO, "-lpng", "-lz", "-lpthread",
            ]
            subprocess.run(cmd, check=True, capture_output=True)
    return _SO


class NativeLoader:
    """Thin, typed wrapper over the C ABI."""

    def __init__(self):
        self._lib = ctypes.CDLL(build())
        self._lib.pngio_info.argtypes = [ctypes.c_char_p] + [
            ctypes.POINTER(ctypes.c_int)
        ] * 4
        for name, ptr in (
            ("pngio_read_u8", ctypes.POINTER(ctypes.c_ubyte)),
            ("pngio_read_u16", ctypes.POINTER(ctypes.c_ushort)),
        ):
            fn = getattr(self._lib, name)
            fn.argtypes = [ctypes.c_char_p, ptr, ctypes.c_long] + [
                ctypes.POINTER(ctypes.c_int)
            ] * 3
        for name, ptr in (
            ("pngio_read_batch_u8", ctypes.POINTER(ctypes.c_ubyte)),
            ("pngio_read_batch_u16", ctypes.POINTER(ctypes.c_ushort)),
        ):
            fn = getattr(self._lib, name)
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ptr,
                ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
            ]

    def info(self, path: str):
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        d = ctypes.c_int()
        rc = self._lib.pngio_info(path.encode(), ctypes.byref(w),
                                ctypes.byref(h), ctypes.byref(c),
                                ctypes.byref(d))
        if rc != 0:
            return None
        return w.value, h.value, c.value, d.value

    def read_png(self, path: str):
        """Decode one PNG -> ndarray (uint8 HxWxC / HxW, or uint16 HxW).
        Returns None on failure (caller falls back to PIL)."""
        meta = self.info(path)
        if meta is None:
            return None
        w, h, c, depth = meta
        shape = (h, w) if c == 1 else (h, w, c)
        if depth == 16:
            out = np.empty(shape, np.uint16)
            fn = self._lib.pngio_read_u16
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_ushort))
        else:
            out = np.empty(shape, np.uint8)
            fn = self._lib.pngio_read_u8
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        wi = ctypes.c_int()
        hi = ctypes.c_int()
        ci = ctypes.c_int()
        rc = fn(path.encode(), ptr, out.size, ctypes.byref(wi),
                ctypes.byref(hi), ctypes.byref(ci))
        return out if rc == 0 else None

    def read_png_batch(self, paths: list[str], dtype=np.uint8,
                       n_threads: int = 0) -> np.ndarray:
        """Decode N same-shape PNGs on the native thread pool into one
        (N, H, W[, C]) array."""
        assert paths
        meta = self.info(paths[0])
        if meta is None:
            raise IOError(f"cannot read {paths[0]}")
        w, h, c, depth = meta
        shape = (len(paths), h, w) if c == 1 else (len(paths), h, w, c)
        arr = np.empty(shape, dtype)
        stride = h * w * c
        c_paths = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        if dtype == np.uint16:
            assert depth == 16
            rc = self._lib.pngio_read_batch_u16(
                c_paths, len(paths),
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ushort)),
                stride, w, h, c, n_threads,
            )
        else:
            assert depth == 8
            rc = self._lib.pngio_read_batch_u8(
                c_paths, len(paths),
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                stride, w, h, c, n_threads,
            )
        if rc != 0:
            raise IOError(f"native batch decode failed rc={rc}")
        return arr
