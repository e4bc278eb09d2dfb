"""Native host-ops loader: compiles hostops.cpp with g++ on first use and
binds it via ctypes (the image has no pybind11; raw-buffer ABI instead —
same role as the reference's cffi builds, ref lib/csrc/fps/setup.py:1-26).

Falls back cleanly: `lib()` returns None when no compiler is available, and
every wrapper has a numpy path behind it at the call site.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "hostops.cpp")
_LIB = None
_TRIED = False


def lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.path.join(tempfile.gettempdir(), f"cpvt_hostops_{digest}.so")
        if not os.path.exists(cache):
            tmp = cache + f".build{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-fopenmp",
                 "-march=native", _SRC, "-o", tmp],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, cache)
        _LIB = ctypes.CDLL(cache)
        _LIB.warp_affine_u8.restype = ctypes.c_int
        _LIB.warp_affine_nearest_u8.restype = ctypes.c_int
        _LIB.compute_vertex_f32.restype = ctypes.c_int
        _LIB.fps_f32.restype = ctypes.c_int
    except Exception:
        _LIB = None
    return _LIB


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def warp_affine_u8(src: np.ndarray, minv: np.ndarray, out_hw, border=0.0):
    """uint8 HWC bilinear warp; minv is the 2×3 output→input mapping."""
    L = lib()
    if L is None:
        return None
    dh, dw = out_hw
    src = np.ascontiguousarray(src, np.uint8)
    c = 1 if src.ndim == 2 else src.shape[2]
    view = src.reshape(src.shape[0], src.shape[1], c)
    dst = np.empty((dh, dw, c), np.uint8)
    minv = np.ascontiguousarray(minv, np.float64)
    L.warp_affine_u8(
        _ptr(view, ctypes.c_uint8), view.shape[0], view.shape[1], c,
        _ptr(minv, ctypes.c_double), _ptr(dst, ctypes.c_uint8), dh, dw,
        ctypes.c_double(border),
    )
    return dst[..., 0] if src.ndim == 2 else dst


def warp_affine_nearest_u8(src: np.ndarray, minv: np.ndarray, out_hw, border=0.0):
    L = lib()
    if L is None:
        return None
    dh, dw = out_hw
    src = np.ascontiguousarray(src, np.uint8)
    dst = np.empty((dh, dw), np.uint8)
    minv = np.ascontiguousarray(minv, np.float64)
    L.warp_affine_nearest_u8(
        _ptr(src, ctypes.c_uint8), src.shape[0], src.shape[1],
        _ptr(minv, ctypes.c_double), _ptr(dst, ctypes.c_uint8), dh, dw,
        ctypes.c_double(border),
    )
    return dst


def compute_vertex_f32(mask: np.ndarray, kpt: np.ndarray):
    L = lib()
    if L is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    kpt = np.ascontiguousarray(kpt, np.float32)
    h, w = mask.shape
    k = kpt.shape[0]
    out = np.empty((h, w, k * 2), np.float32)
    L.compute_vertex_f32(
        _ptr(mask, ctypes.c_uint8), h, w, _ptr(kpt, ctypes.c_float), k,
        _ptr(out, ctypes.c_float),
    )
    return out


def fps_f32(pts: np.ndarray, m: int, init_center: bool = False):
    L = lib()
    if L is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    idx = np.empty((m,), np.int32)
    L.fps_f32(
        _ptr(pts, ctypes.c_float), pts.shape[0], m, int(init_center),
        _ptr(idx, ctypes.c_int32),
    )
    return pts[idx]
