"""Native (C++) host preprocessing library, loaded via ctypes.

Builds `libtokenhmr_warp.so` from warp.cpp on first use (g++ -O3).  The
exported kernels replace cv2.warpAffine + python normalization in the
dataloader hot path (ref `datasets/utils.py:348, 620-624`); see warp.cpp.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libtokenhmr_warp.so")
_SRC = os.path.join(_HERE, "warp.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _SO_PATH, _SRC, "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.warp_affine_normalize_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f64p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
        ]
        lib.warp_affine_normalize_batch_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f64p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
            ctypes.c_int,
        ]
        lib.warp_affine_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f64p, u8p, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


MAX_CHANNELS = 4  # must match kMaxChannels in warp.cpp


def _check_channels(c: int) -> None:
    if not 1 <= c <= MAX_CHANNELS:
        raise ValueError(f"native warp supports 1..{MAX_CHANNELS} channels, got {c}")


def warp_affine_u8(img: np.ndarray, trans: np.ndarray,
                   out_wh: Tuple[int, int], border_value=0) -> np.ndarray:
    """cv2.warpAffine-compatible signature (drop-in for augment backend)."""
    lib = get_lib()
    img = np.ascontiguousarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    _check_channels(img.shape[2])
    dw, dh = out_wh
    dst = np.empty((dh, dw, img.shape[2]), np.uint8)
    t = np.ascontiguousarray(trans, np.float64)
    lib.warp_affine_u8(
        _ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1], img.shape[2],
        _ptr(t, ctypes.c_double), _ptr(dst, ctypes.c_uint8), dh, dw,
    )
    return dst[:, :, 0] if squeeze else dst


def warp_normalize(
    img: np.ndarray,               # (H, W, C) uint8
    trans: np.ndarray,             # (2, 3) or (N, 2, 3)
    out_hw: Tuple[int, int],
    color_scale: np.ndarray,
    mean: np.ndarray,
    std: np.ndarray,
    num_threads: int = 4,
) -> np.ndarray:
    """Fused warp + color-scale + normalize.  Returns (N?, H, W, C) f32."""
    lib = get_lib()
    img = np.ascontiguousarray(img)
    C = img.shape[2]
    _check_channels(C)
    dh, dw = out_hw
    cs = np.ascontiguousarray(color_scale, np.float32)
    mn = np.ascontiguousarray(mean, np.float32)
    ist = np.ascontiguousarray(1.0 / np.asarray(std, np.float32), np.float32)
    t = np.ascontiguousarray(trans, np.float64)
    if t.ndim == 2:
        dst = np.empty((dh, dw, C), np.float32)
        lib.warp_affine_normalize_u8(
            _ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1], C,
            _ptr(t, ctypes.c_double), _ptr(dst, ctypes.c_float), dh, dw,
            _ptr(cs, ctypes.c_float), _ptr(mn, ctypes.c_float),
            _ptr(ist, ctypes.c_float),
        )
        return dst
    n = t.shape[0]
    dst = np.empty((n, dh, dw, C), np.float32)
    lib.warp_affine_normalize_batch_u8(
        _ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1], C, n,
        _ptr(t, ctypes.c_double), _ptr(dst, ctypes.c_float), dh, dw,
        _ptr(cs, ctypes.c_float), _ptr(mn, ctypes.c_float),
        _ptr(ist, ctypes.c_float), num_threads,
    )
    return dst


def use_as_augment_backend() -> None:
    """Route the augment pipeline's warps through the native kernel."""
    from ..data.augment import set_warp_backend

    set_warp_backend(lambda img, trans, out_wh, border_value=0:
                     warp_affine_u8(img, trans, out_wh, border_value))
