"""ctypes bindings for the native ingestion runtime (decode.cpp).

Builds the shared library on first use (g++ -O3 -ljpeg, cached next to the
source); falls back gracefully (`available() == False`) if the toolchain or
libjpeg is missing, in which case callers use the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decode.cpp")
_SO = os.path.join(_HERE, "_libergo_native.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    """Compile decode.cpp if needed; returns error string or None."""
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return None
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-ljpeg", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except Exception as e:  # toolchain missing
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        _build_error = _build()
        if _build_error is not None:
            return
        lib = ctypes.CDLL(_SO)
        lib.eun_decode_jpeg.restype = ctypes.c_int
        lib.eun_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.eun_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.eun_demosaic_bggr.restype = ctypes.c_int
        lib.eun_demosaic_bggr.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p
        ]
        lib.eun_loader_create.restype = ctypes.c_void_p
        lib.eun_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.eun_loader_next.restype = ctypes.c_long
        lib.eun_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.eun_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib


def available() -> bool:
    _load()
    return _lib is not None


def build_error() -> str | None:
    _load()
    return _build_error


def decode_jpeg(data: bytes, gray: bool = True) -> np.ndarray:
    """Decode JPEG bytes to (H, W) gray or (H, W, 3) RGB uint8."""
    _load()
    assert _lib is not None, _build_error
    ch = 1 if gray else 3
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = _lib.eun_decode_jpeg(data, len(data), ch, ctypes.byref(out),
                              ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"JPEG decode failed (rc={rc})")
    n = w.value * h.value * ch
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    _lib.eun_free(out)
    shape = (h.value, w.value) if gray else (h.value, w.value, 3)
    return arr.reshape(shape)


def demosaic_bggr(bayer: np.ndarray) -> np.ndarray:
    """(H, W) uint8 BGGR mosaic -> (H, W, 3) RGB uint8 (bilinear).

    The reference's bayer branch (math_utility.cpp:166-170, BayerBG).
    """
    _load()
    assert _lib is not None, _build_error
    bayer = np.ascontiguousarray(bayer, np.uint8)
    h, w = bayer.shape
    out = np.empty((h, w, 3), np.uint8)
    rc = _lib.eun_demosaic_bggr(
        bayer.ctypes.data_as(ctypes.c_char_p), w, h,
        out.ctypes.data_as(ctypes.c_char_p),
    )
    if rc != 0:
        raise ValueError("demosaic failed")
    return out


class JpegLoader:
    """Prefetching multi-threaded JPEG file loader (bounded ring buffer)."""

    def __init__(self, paths, threads: int = 4, capacity: int = 16,
                 gray: bool = True):
        _load()
        assert _lib is not None, _build_error
        self._paths = [os.fsencode(p) for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._n = len(self._paths)
        self._gray = gray
        self._handle = _lib.eun_loader_create(
            arr, self._n, threads, capacity, 1 if gray else 3
        )

    def __iter__(self):
        ch = 1 if self._gray else 3
        buf = np.empty(64 * 1024 * 1024, np.uint8)  # 64 MB frame cap
        idx = ctypes.c_int()
        w = ctypes.c_int()
        h = ctypes.c_int()
        while True:
            n = _lib.eun_loader_next(
                self._handle, buf.ctypes.data_as(ctypes.c_char_p), buf.size,
                ctypes.byref(idx), ctypes.byref(w), ctypes.byref(h),
            )
            if n <= 0:
                break
            shape = (h.value, w.value) if ch == 1 else (h.value, w.value, 3)
            yield idx.value, buf[:n].reshape(shape).copy()

    def close(self):
        if self._handle:
            _lib.eun_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
