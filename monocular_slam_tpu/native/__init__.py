"""ctypes bindings for the native IO runtime (libslamio).

Builds on first use (g++ -O3, zlib) and caches the shared object next to the
source. Falls back to PIL transparently if the toolchain is unavailable, so
the pure-Python path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "slamio.cpp")
_LIB = os.path.join(_DIR, "libslamio.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def build(force: bool = False) -> str:
    """Compile libslamio.so; returns its path."""
    if force or not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
            "-o", _LIB, "-lz", "-pthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            lib = ctypes.CDLL(build())
        except Exception:
            _build_failed = True
            return None
        lib.slamio_load_png_f32.restype = ctypes.c_int
        lib.slamio_load_png_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_float,
        ]
        lib.slamio_png_size.restype = ctypes.c_int
        lib.slamio_png_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.slamio_load_batch_f32.restype = None
        lib.slamio_load_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_float,
            ctypes.c_int,
        ]
        lib.slamio_parse_trajectory.restype = ctypes.c_int
        lib.slamio_parse_trajectory.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_png_f32(path: str, scale16: float = 1.0 / 256.0) -> np.ndarray:
    """Decode a PNG to float32 grayscale (H, W). 16-bit values are scaled by
    `scale16` (1/5000 turns TUM depth into meters). PIL fallback otherwise."""
    lib = _load()
    if lib is None:
        return _pil_load(path, scale16)
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.slamio_png_size(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return _pil_load(path, scale16)
    cap = w.value * h.value
    out = np.empty(cap, np.float32)
    rc = lib.slamio_load_png_f32(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
        ctypes.byref(w),
        ctypes.byref(h),
        ctypes.c_float(scale16),
    )
    if rc != 0:
        return _pil_load(path, scale16)
    return out.reshape(h.value, w.value)


def load_batch_f32(paths: list[str], scale16: float = 1.0 / 256.0, n_threads: int = 0):
    """Threaded batch decode -> list of (H, W) float32 arrays."""
    lib = _load()
    if lib is None:
        return [_pil_load(p, scale16) for p in paths]
    n = len(paths)
    if n == 0:
        return []
    # capacity = max image size (probe first file; assume uniform dataset)
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.slamio_png_size(paths[0].encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return [_pil_load(p, scale16) for p in paths]
    cap = w.value * h.value
    out = np.empty((n, cap), np.float32)
    whs = np.zeros(2 * n, np.int32)
    rcs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.slamio_load_batch_f32(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
        whs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_float(scale16),
        n_threads,
    )
    imgs = []
    for i in range(n):
        if rcs[i] != 0:
            imgs.append(_pil_load(paths[i], scale16))
        else:
            wi, hi = whs[2 * i], whs[2 * i + 1]
            imgs.append(out[i, : wi * hi].reshape(hi, wi).copy())
    return imgs


def parse_trajectory(path: str, max_rows: int = 100000) -> np.ndarray:
    """Parse 'ts tx ty tz qx qy qz qw' rows -> (N, 8) float64."""
    lib = _load()
    if lib is None:
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                vals = line.split()
                if len(vals) >= 8:
                    rows.append([float(v) for v in vals[:8]])
        return np.asarray(rows, np.float64).reshape(-1, 8)
    out = np.empty((max_rows, 8), np.float64)
    n = lib.slamio_parse_trajectory(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_rows
    )
    if n < 0:
        raise IOError(f"cannot parse {path}")
    return out[:n].copy()


def _pil_load(path: str, scale16: float) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img)
    if arr.dtype == np.uint16:
        return arr.astype(np.float32) * scale16
    if arr.ndim == 3:
        img = img.convert("L")
        arr = np.asarray(img)
    return arr.astype(np.float32)
