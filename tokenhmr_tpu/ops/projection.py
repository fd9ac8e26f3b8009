"""Camera models: perspective projection + weak-perspective translation.

Ref behavior: `tokenhmr/lib/utils/geometry.py:86-123` (perspective_projection),
`tokenhmr/lib/models/tokenhmr.py:166-176` (weak-persp cam -> translation),
`tokenhmr/lib/utils/renderer.py:13-23` (crop cam -> full-image cam).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def perspective_projection(
    points: jax.Array,
    translation: jax.Array,
    focal_length: jax.Array,
    camera_center: Optional[jax.Array] = None,
    rotation: Optional[jax.Array] = None,
) -> jax.Array:
    """Project (B, N, 3) points to (B, N, 2).

    focal_length: (B, 2); camera_center: (B, 2) or None (zeros);
    rotation: (B, 3, 3) or None (identity).  Matches ref
    `geometry.py:86-123` exactly (divide by z, then apply K).
    """
    if rotation is not None:
        points = jnp.einsum("bij,bkj->bki", rotation, points)
    points = points + translation[:, None, :]
    projected = points[..., :2] / points[..., 2:3]
    projected = projected * focal_length[:, None, :]
    if camera_center is not None:
        projected = projected + camera_center[:, None, :]
    return projected


def weak_perspective_to_translation(
    pred_cam: jax.Array, focal_length: jax.Array, image_size: float
) -> jax.Array:
    """(B, 3) weak-persp cam (s, tx, ty) -> (B, 3) camera translation.

    Ref: `tokenhmr.py:168-171`: t = [cam_1, cam_2, 2*f/(image_size*cam_0)].
    """
    tz = 2.0 * focal_length[:, 0] / (image_size * pred_cam[:, 0] + 1e-9)
    return jnp.stack([pred_cam[:, 1], pred_cam[:, 2], tz], axis=-1)


def cam_crop_to_full(
    cam_bbox: jax.Array,
    box_center: jax.Array,
    box_size: jax.Array,
    img_size: jax.Array,
    focal_length: float = 5000.0,
) -> jax.Array:
    """Convert crop-space weak-persp cam to full-image translation.

    cam_bbox: (B, 3) = (s, tx, ty) in the crop; box_center: (B, 2) px;
    box_size: (B,) px; img_size: (B, 2) = (w, h) px.
    Ref: `renderer.py:13-23`.
    """
    img_w, img_h = img_size[:, 0], img_size[:, 1]
    cx, cy, b = box_center[:, 0], box_center[:, 1], box_size
    w_2, h_2 = img_w / 2.0, img_h / 2.0
    bs = b * cam_bbox[:, 0] + 1e-9
    tz = 2.0 * focal_length / bs
    tx = (2.0 * (cx - w_2) / bs) + cam_bbox[:, 1]
    ty = (2.0 * (cy - h_2) / bs) + cam_bbox[:, 2]
    return jnp.stack([tx, ty, tz], axis=-1)
