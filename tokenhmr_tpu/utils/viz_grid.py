"""Training/eval visualization grids.

Capabilities of ref `mesh_renderer.py:70-107` (visualize_tensorboard: per
sample [input | mesh front | mesh side | pred skeleton | gt skeleton]) and
`tokenization/utils/pose_visualize.py` (tokenizer GT-vs-pred mesh grids) —
built on the numpy rasterizer, no GL.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .render import overlay_mesh_on_image, rasterize_mesh, render_openpose

_SIDE_ROT = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)


def denormalize_image(img: np.ndarray,
                      mean=(0.485, 0.456, 0.406),
                      std=(0.229, 0.224, 0.225)) -> np.ndarray:
    """(H, W, 3) normalized float -> uint8 RGB (ref tokenhmr.py:296-298)."""
    out = img * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def visualize_sample(
    img_norm: np.ndarray,            # (H, W, 3) normalized input crop
    pred_vertices: np.ndarray,       # (V, 3)
    pred_cam_t: np.ndarray,          # (3,)
    faces: np.ndarray,
    pred_keypoints_2d: Optional[np.ndarray] = None,   # (44, 2) in [-.5,.5]
    gt_keypoints_2d: Optional[np.ndarray] = None,     # (44, 3)
    focal_length: float = 5000.0,
) -> np.ndarray:
    """One sample row: [input | mesh | side mesh | pred kp | gt kp]."""
    H, W = img_norm.shape[:2]
    rgb = denormalize_image(img_norm)
    panels = [rgb]

    v_cam = pred_vertices + pred_cam_t
    panels.append(overlay_mesh_on_image(rgb, v_cam, faces,
                                        focal_length / 256.0 * H, alpha=0.9))
    side_bg = np.full_like(rgb, 255)
    v_side = pred_vertices @ _SIDE_ROT.T + pred_cam_t
    side, mask = rasterize_mesh(v_side, faces, (H, W), focal_length / 256.0 * H)
    side_img = side_bg.copy()
    side_img[mask] = (side[mask] * 255).astype(np.uint8)
    panels.append(side_img)

    def kp_panel(kp, conf=None):
        pix = (kp[:, :2] + 0.5) * np.array([W, H])
        c = conf if conf is not None else np.ones(len(kp))
        kps = np.concatenate([pix, c[:, None]], axis=1)
        return render_openpose(rgb, kps)

    if pred_keypoints_2d is not None:
        panels.append(kp_panel(pred_keypoints_2d))
    if gt_keypoints_2d is not None:
        panels.append(kp_panel(gt_keypoints_2d[:, :2], gt_keypoints_2d[:, 2]))
    return np.concatenate(panels, axis=1)


def visualize_batch_grid(
    batch: Dict, output: Dict, faces: np.ndarray, num_images: int = 4,
) -> np.ndarray:
    """Stack sample rows into one grid image (the TB summary image of ref
    `tokenhmr.py:305-327`)."""
    n = min(num_images, len(np.asarray(batch["img"])))
    rows = []
    for i in range(n):
        rows.append(visualize_sample(
            np.asarray(batch["img"][i]),
            np.asarray(output["pred_vertices"][i]),
            np.asarray(output["pred_cam_t"][i]),
            faces,
            np.asarray(output["pred_keypoints_2d"][i]),
            np.asarray(batch["keypoints_2d"][i])
            if "keypoints_2d" in batch else None,
            focal_length=float(np.asarray(output["focal_length"][i][0])),
        ))
    return np.concatenate(rows, axis=0)


def visualize_pose_grid(
    gt_vertices: np.ndarray,         # (N, V, 3)
    pred_vertices: np.ndarray,       # (N, V, 3)
    faces: np.ndarray,
    image_size: int = 200,
    focal_length: float = 800.0,
    cam_z: float = 3.0,
) -> np.ndarray:
    """Tokenizer-style GT-vs-pred mesh grid (ref pose_visualize.py:73-112):
    rows of [gt | pred | pred side]."""
    rows = []
    for i in range(len(gt_vertices)):
        panels = []
        for verts in (gt_vertices[i], pred_vertices[i],
                      pred_vertices[i] @ _SIDE_ROT.T):
            v = verts - verts.mean(0)
            v = v + np.array([0, 0, cam_z], np.float32)
            rgb, mask = rasterize_mesh(v, faces, (image_size, image_size),
                                       focal_length)
            panel = np.full((image_size, image_size, 3), 255, np.uint8)
            panel[mask] = (rgb[mask] * 255).astype(np.uint8)
            panels.append(panel)
        rows.append(np.concatenate(panels, axis=1))
    return np.concatenate(rows, axis=0)
