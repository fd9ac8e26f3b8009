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


# ---------------------------------------------------------------------------
# Native JPEG decoding (jpegdec.cpp, libjpeg): replaces cv2.imdecode in the
# loader hot path; the batch variant decodes on a C++ thread pool with the
# GIL released for the whole call.
# ---------------------------------------------------------------------------

_JPEG_SO = os.path.join(_HERE, "libtokenhmr_jpeg.so")
_JPEG_SRC = os.path.join(_HERE, "jpegdec.cpp")
_jpeg_lib: Optional[ctypes.CDLL] = None


def get_jpeg_lib() -> Optional[ctypes.CDLL]:
    """Build+load the jpeg decoder; None if libjpeg is unavailable."""
    global _jpeg_lib
    with _lock:
        if _jpeg_lib is not None:
            return _jpeg_lib
        try:
            if (not os.path.exists(_JPEG_SO)
                    or os.path.getmtime(_JPEG_SO) < os.path.getmtime(_JPEG_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", "-o", _JPEG_SO, _JPEG_SRC, "-ljpeg",
                     "-lpthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_JPEG_SO)
        except (OSError, subprocess.CalledProcessError):
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.thmr_jpeg_dims.argtypes = [u8p, ctypes.c_size_t, ip, ip]
        lib.thmr_jpeg_dims.restype = ctypes.c_int
        lib.thmr_jpeg_decode.argtypes = [u8p, ctypes.c_size_t, u8p,
                                         ctypes.c_int, ctypes.c_int]
        lib.thmr_jpeg_decode.restype = ctypes.c_int
        lib.thmr_jpeg_decode_batch.argtypes = [
            ctypes.c_int, ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(u8p),
            ip, ip, ip, ctypes.c_int,
        ]
        _jpeg_lib = lib
        return lib


def jpeg_decode(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> (H, W, 3) uint8 RGB; None on failure / no libjpeg."""
    lib = get_jpeg_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.thmr_jpeg_dims(_ptr(buf, ctypes.c_uint8), len(data),
                          ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.thmr_jpeg_decode(_ptr(buf, ctypes.c_uint8), len(data),
                              _ptr(out, ctypes.c_uint8), h.value, w.value)
    return out if rc == 0 else None


def jpeg_decode_batch(datas, num_threads: int = 4):
    """List of JPEG bytes -> list of (H, W, 3) uint8 RGB (None where a
    member failed).  Decodes on a C++ thread pool, GIL released."""
    lib = get_jpeg_lib()
    if lib is None:
        return [None] * len(datas)
    n = len(datas)
    bufs = [np.frombuffer(d, np.uint8) for d in datas]
    dims = []
    outs: list = []
    u8p = ctypes.POINTER(ctypes.c_uint8)
    data_arr = (u8p * n)()
    len_arr = (ctypes.c_size_t * n)()
    out_arr = (u8p * n)()
    h_arr = (ctypes.c_int * n)()
    w_arr = (ctypes.c_int * n)()
    rc_arr = (ctypes.c_int * n)()
    for i, b in enumerate(bufs):
        w, h = ctypes.c_int(), ctypes.c_int()
        ok = lib.thmr_jpeg_dims(_ptr(b, ctypes.c_uint8), len(b),
                                ctypes.byref(w), ctypes.byref(h)) == 0
        dims.append((h.value, w.value) if ok else None)
        out = np.empty((h.value, w.value, 3), np.uint8) if ok else \
            np.empty((1, 1, 3), np.uint8)
        outs.append(out)
        data_arr[i] = _ptr(b, ctypes.c_uint8)
        len_arr[i] = len(b)
        out_arr[i] = _ptr(out, ctypes.c_uint8)
        h_arr[i] = out.shape[0]
        w_arr[i] = out.shape[1]
        rc_arr[i] = 0 if ok else 99
    lib.thmr_jpeg_decode_batch(n, data_arr, len_arr, out_arr, h_arr, w_arr,
                               rc_arr, num_threads)
    return [outs[i] if (dims[i] is not None and rc_arr[i] == 0) else None
            for i in range(n)]


def use_as_augment_backend() -> None:
    """Route the augment pipeline's warps through the native kernel."""
    from ..data.augment import set_warp_backend

    set_warp_backend(lambda img, trans, out_wh, border_value=0:
                     warp_affine_u8(img, trans, out_wh, border_value))
