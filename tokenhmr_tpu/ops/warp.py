"""On-device batched crop-warp + normalize.

The SURVEY §2.9 replacement for cv2.warpAffine in the ACCELERATOR path:
ship the full frame to the device once, produce all N person crops there
(bbox-conditioned bilinear sampling expressed as XLA gathers), normalized
and ready for the backbone — one fused jit with the model forward.

The host path (native C++ kernel / cv2) remains for dataloader workers;
this is the single-frame multi-person serving path (demo/track), where one
H2D transfer of the frame replaces N crop transfers.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0


def _invert_affines(trans: jax.Array) -> jax.Array:
    """(N, 2, 3) dst<-src affines -> (N, 2, 3) src<-dst sampling maps."""
    A = trans[:, :, :2]
    t = trans[:, :, 2]
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    Ainv = jnp.stack([
        jnp.stack([A[:, 1, 1], -A[:, 0, 1]], -1),
        jnp.stack([-A[:, 1, 0], A[:, 0, 0]], -1),
    ], axis=1) * inv_det[:, None, None]
    tinv = -jnp.einsum("nij,nj->ni", Ainv, t)
    return jnp.concatenate([Ainv, tinv[:, :, None]], axis=2)


def warp_crops_device(
    image: jax.Array,            # (H, W, 3) uint8 or float
    trans: jax.Array,            # (N, 2, 3) dst<-src affines (cv2 convention)
    out_hw: Tuple[int, int] = (256, 256),
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
) -> jax.Array:
    """Bilinear-warp N crops out of one frame, normalized float32 (N,h,w,3).

    Matches cv2.warpAffine INTER_LINEAR + BORDER_CONSTANT(0) then imagenet
    normalization (the demo/eval preprocessing contract).
    """
    H, W = image.shape[:2]
    h, w = out_hw
    img = image.astype(jnp.float32)
    inv = _invert_affines(trans.astype(jnp.float32))       # (N, 2, 3)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                          # (h, w)
    ones = jnp.ones_like(gx)
    dst = jnp.stack([gx, gy, ones], axis=-1)               # (h, w, 3)
    src = jnp.einsum("nij,hwj->nhwi", inv, dst)            # (N, h, w, 2) x,y

    sx, sy = src[..., 0], src[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    ax = sx - x0
    ay = sy - y0

    def sample(yi, xi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = img[yi_c, xi_c]                             # gather (N,h,w,3)
        return jnp.where(inside[..., None], vals, 0.0)

    p00 = sample(y0, x0)
    p01 = sample(y0, x0 + 1)
    p10 = sample(y0 + 1, x0)
    p11 = sample(y0 + 1, x0 + 1)
    out = (
        p00 * ((1 - ax) * (1 - ay))[..., None]
        + p01 * (ax * (1 - ay))[..., None]
        + p10 * ((1 - ax) * ay)[..., None]
        + p11 * (ax * ay)[..., None]
    )
    return (out - jnp.asarray(mean)) / jnp.asarray(std)


def warp_crops_device_multi(
    frames: jax.Array,           # (F, H, W, 3) uint8 or float
    trans: jax.Array,            # (N, 2, 3) dst<-src affines (cv2 convention)
    frame_idx: jax.Array,        # (N,) int32 source frame per crop
    out_hw: Tuple[int, int] = (256, 256),
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
) -> jax.Array:
    """warp_crops_device over a BATCH of frames: crop i samples
    frames[frame_idx[i]].  Lets the serving path batch many frames'
    crops into one device program (cross-frame dynamic batching) instead
    of one dispatch per frame — dispatch latency amortizes over the
    window.  Same bilinear + border-0 + imagenet-normalize contract.
    """
    F, H, W = frames.shape[:3]
    h, w = out_hw
    img = frames.astype(jnp.float32)
    inv = _invert_affines(trans.astype(jnp.float32))       # (N, 2, 3)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    ones = jnp.ones_like(gx)
    dst = jnp.stack([gx, gy, ones], axis=-1)               # (h, w, 3)
    src = jnp.einsum("nij,hwj->nhwi", inv, dst)            # (N, h, w, 2)

    sx, sy = src[..., 0], src[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    ax = sx - x0
    ay = sy - y0
    fidx = frame_idx.astype(jnp.int32)[:, None, None]      # (N, 1, 1)

    def sample(yi, xi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = img[fidx, yi_c, xi_c]                       # gather (N,h,w,3)
        return jnp.where(inside[..., None], vals, 0.0)

    p00 = sample(y0, x0)
    p01 = sample(y0, x0 + 1)
    p10 = sample(y0 + 1, x0)
    p11 = sample(y0 + 1, x0 + 1)
    out = (
        p00 * ((1 - ax) * (1 - ay))[..., None]
        + p01 * (ax * (1 - ay))[..., None]
        + p10 * ((1 - ax) * ay)[..., None]
        + p11 * (ax * ay)[..., None]
    )
    return (out - jnp.asarray(mean)) / jnp.asarray(std)


def crop_affines_for_boxes(
    centers: np.ndarray,         # (N, 2)
    sizes: np.ndarray,           # (N,) square bbox size
    out_size: int = 256,
) -> np.ndarray:
    """(N, 2, 3) dst<-src affines for square crops (host-side, cheap)."""
    from .crop import gen_crop_affine

    return np.stack([
        gen_crop_affine(c[0], c[1], s, s, out_size, out_size)
        for c, s in zip(centers, sizes)
    ]).astype(np.float32)
