"""Bounding-box crop affine math (pure numpy/jnp; warp kernels live in
`ops.warp` for the on-device path and `native/` for the host path).

Ref behavior: `tokenhmr/lib/datasets/utils.py:14-33` (expand_to_aspect_ratio),
`:64-128` (rotate_2d, gen_trans_from_patch_cv), `:317-360`
(generate_image_patch_cv2 semantics), `vitdet_dataset.py:37-65`
(detector box -> center/scale convention).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

# TokenHMR's ViT input: 256x192 (h x w) crops; bbox shape in cfg is (192, 256)
DEFAULT_BBOX_SHAPE = (192, 256)  # (w, h)
DEFAULT_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
DEFAULT_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def expand_to_aspect_ratio(input_shape, target_aspect_ratio=None) -> np.ndarray:
    """Grow a (w, h) box minimally so its aspect ratio matches the target.

    Ref: `datasets/utils.py:14-33`.
    """
    if target_aspect_ratio is None:
        return np.asarray(input_shape)
    w, h = float(input_shape[0]), float(input_shape[1])
    w_t, h_t = target_aspect_ratio
    if h / w < h_t / w_t:
        h_new = max(w * h_t / w_t, h)
        w_new = w
    else:
        h_new = h
        w_new = max(h * w_t / h_t, w)
    return np.array([w_new, h_new])


def rotate_2d(pt: np.ndarray, rot_rad: float) -> np.ndarray:
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs], dtype=np.float32)


def gen_crop_affine(
    c_x: float,
    c_y: float,
    src_width: float,
    src_height: float,
    dst_width: float,
    dst_height: float,
    scale: float = 1.0,
    rot: float = 0.0,
) -> np.ndarray:
    """2x3 affine mapping source-image coords -> destination-patch coords.

    Closed form of the three-point solve in ref `datasets/utils.py:81-128`
    (cv2.getAffineTransform on {center, center+down, center+right}); verified
    bit-equal to cv2 in tests.  rot is in degrees, counter-clockwise.
    """
    src_w = src_width * scale
    src_h = src_height * scale
    rot_rad = np.pi * rot / 180.0
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)

    # The affine maps: src_center -> dst_center, rotated down/right half-axes
    # -> axis-aligned dst half-axes.  Writing dst = A @ src + t:
    #   A @ R(rot) @ [src_w/2, 0]^T = [dst_w/2, 0]^T
    #   A @ R(rot) @ [0, src_h/2]^T = [0, dst_h/2]^T
    # => A = diag(dst_w/src_w, dst_h/src_h) @ R(-rot)
    a00 = (dst_width / src_w) * cs
    a01 = (dst_width / src_w) * sn
    a10 = -(dst_height / src_h) * sn
    a11 = (dst_height / src_h) * cs
    t0 = dst_width * 0.5 - (a00 * c_x + a01 * c_y)
    t1 = dst_height * 0.5 - (a10 * c_x + a11 * c_y)
    return np.array([[a00, a01, t0], [a10, a11, t1]], dtype=np.float64)


def invert_affine(trans: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine."""
    A = trans[:, :2]
    t = trans[:, 2]
    Ainv = np.linalg.inv(A)
    return np.concatenate([Ainv, (-Ainv @ t)[:, None]], axis=1)


def transform_points_2d(trans: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply a 2x3 affine to (..., 2) points."""
    return pts @ trans[:, :2].T + trans[:, 2]


def bbox_xyxy_to_center_scale(
    boxes: np.ndarray, rescale_factor: float = 2.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Detector (N, 4) xyxy boxes -> (N, 2) centers and (N, 2) scales.

    Uses the HMR "/200" scale convention (ref `vitdet_dataset.py:36-38`):
    scale = rescale_factor * box_size / 200.
    """
    boxes = np.asarray(boxes, dtype=np.float32)
    center = (boxes[:, 2:4] + boxes[:, 0:2]) / 2.0
    scale = rescale_factor * (boxes[:, 2:4] - boxes[:, 0:2]) / 200.0
    return center, scale


def crop_params_from_center_scale(
    center: np.ndarray,
    scale: np.ndarray,
    bbox_shape=DEFAULT_BBOX_SHAPE,
) -> Tuple[np.ndarray, np.ndarray]:
    """(center (N,2), scale (N,2) in /200 units) -> per-box (cx, cy, w, h).

    Expands each box to the model aspect ratio.  Ref: `vitdet_dataset.py:44-50`.
    """
    out_size = np.zeros_like(center)
    for i in range(center.shape[0]):
        wh = expand_to_aspect_ratio(scale[i] * 200.0, target_aspect_ratio=bbox_shape)
        out_size[i] = wh
    return center, out_size
