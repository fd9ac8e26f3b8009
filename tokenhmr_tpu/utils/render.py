"""Host-side visualization: mesh overlay rasterizer + keypoint skeletons.

Capability parity with ref `tokenhmr/lib/utils/{renderer,mesh_renderer,
skeleton_renderer,render_openpose}.py` WITHOUT the pyrender/EGL/OpenGL
native dependency chain: a compact numpy z-buffer rasterizer with Lambertian
shading (visualization is off the accelerator path by design — SURVEY §2.9).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# OpenPose BODY_25 limb pairs + colors (ref render_openpose.py limb tables)
OPENPOSE_LIMBS = [
    (1, 8), (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (8, 9), (9, 10),
    (10, 11), (8, 12), (12, 13), (13, 14), (1, 0), (0, 15), (15, 17), (0, 16),
    (16, 18), (14, 19), (19, 20), (14, 21), (11, 22), (22, 23), (11, 24),
]
_LIMB_COLORS = np.array([
    [255, 0, 85], [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
    [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170],
    [0, 255, 255], [0, 170, 255], [0, 85, 255], [0, 0, 255], [255, 0, 170],
    [170, 0, 255], [255, 0, 255], [85, 0, 255], [0, 0, 255], [0, 0, 255],
    [0, 0, 255], [0, 255, 255], [0, 255, 255], [0, 255, 255]], np.uint8)


def render_openpose(img: np.ndarray, keypoints: np.ndarray) -> np.ndarray:
    """Draw a BODY_25 skeleton; keypoints (25+, 3) in pixel coords."""
    out = img.copy()
    for li, (a, b) in enumerate(OPENPOSE_LIMBS):
        if keypoints[a, 2] > 0 and keypoints[b, 2] > 0:
            pa = tuple(np.round(keypoints[a, :2]).astype(int))
            pb = tuple(np.round(keypoints[b, :2]).astype(int))
            cv2.line(out, pa, pb, _LIMB_COLORS[li % len(_LIMB_COLORS)].tolist(), 2)
    for k in range(min(25, len(keypoints))):
        if keypoints[k, 2] > 0:
            cv2.circle(out, tuple(np.round(keypoints[k, :2]).astype(int)), 3,
                       (255, 255, 255), -1)
    return out


def rasterize_mesh(
    vertices: np.ndarray,          # (V, 3) camera-space
    faces: np.ndarray,             # (F, 3)
    image_hw: Tuple[int, int],
    focal_length: float,
    camera_center: Optional[Tuple[float, float]] = None,
    color: Tuple[float, float, float] = (0.65, 0.74, 0.86),
    light_dir: Tuple[float, float, float] = (0.3, 0.3, -1.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Perspective-project + z-buffer rasterize. Returns (rgb float [0,1]
    (H, W, 3), mask (H, W))."""
    H, W = image_hw
    cx, cy = camera_center if camera_center is not None else (W / 2.0, H / 2.0)

    z = vertices[:, 2]
    valid_z = np.maximum(z, 1e-6)
    px = vertices[:, 0] / valid_z * focal_length + cx
    py = vertices[:, 1] / valid_z * focal_length + cy
    pts = np.stack([px, py], axis=1)

    # per-face normals + Lambert shading (flat)
    v0, v1, v2 = (vertices[faces[:, i]] for i in range(3))
    n = np.cross(v1 - v0, v2 - v0)
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-9)
    L = np.asarray(light_dir, np.float64)
    L = L / np.linalg.norm(L)
    shade = np.clip(-n @ L, 0.15, 1.0)

    face_z = (v0[:, 2] + v1[:, 2] + v2[:, 2]) / 3.0
    order = np.argsort(-face_z)  # painter's: far to near

    rgb = np.zeros((H, W, 3), np.float32)
    zbuf = np.full((H, W), np.inf, np.float32)
    mask = np.zeros((H, W), bool)

    tri_pts = pts[faces]                       # (F, 3, 2)
    # cull off-screen / behind-camera faces
    keep = (
        (vertices[faces][:, :, 2] > 1e-5).all(axis=1)
        & (tri_pts[:, :, 0].max(1) >= 0) & (tri_pts[:, :, 0].min(1) < W)
        & (tri_pts[:, :, 1].max(1) >= 0) & (tri_pts[:, :, 1].min(1) < H)
    )
    base = np.asarray(color, np.float32)
    for fi in order:
        if not keep[fi]:
            continue
        tri = tri_pts[fi]
        x0 = max(int(np.floor(tri[:, 0].min())), 0)
        x1 = min(int(np.ceil(tri[:, 0].max())) + 1, W)
        y0 = max(int(np.floor(tri[:, 1].min())), 0)
        y1 = min(int(np.ceil(tri[:, 1].max())) + 1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5)
        d = _barycentric_inside(tri, xs, ys)
        if d is None:
            continue
        inside, zface = d
        zval = face_z[fi]
        sub = zbuf[y0:y1, x0:x1]
        upd = inside & (zval < sub)
        sub[upd] = zval
        rgb[y0:y1, x0:x1][upd] = base * shade[fi]
        mask[y0:y1, x0:x1] |= upd
    return rgb, mask


def _barycentric_inside(tri, xs, ys):
    x0, y0 = tri[0]
    x1, y1 = tri[1]
    x2, y2 = tri[2]
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    if abs(denom) < 1e-12:
        return None
    a = ((y1 - y2) * (xs - x2) + (x2 - x1) * (ys - y2)) / denom
    b = ((y2 - y0) * (xs - x2) + (x0 - x2) * (ys - y2)) / denom
    c = 1.0 - a - b
    inside = (a >= 0) & (b >= 0) & (c >= 0)
    return inside, None


def overlay_mesh_on_image(
    img: np.ndarray,               # (H, W, 3) uint8 RGB
    vertices: np.ndarray,          # (V, 3) camera-space (after cam_t add)
    faces: np.ndarray,
    focal_length: float,
    alpha: float = 1.0,
) -> np.ndarray:
    """Composite a rendered mesh over the image (ref renderer.py usage)."""
    H, W = img.shape[:2]
    rgb, mask = rasterize_mesh(vertices, faces, (H, W), focal_length)
    out = img.astype(np.float32) / 255.0
    out[mask] = (1 - alpha) * out[mask] + alpha * rgb[mask]
    return (out * 255).astype(np.uint8)


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    """Minimal .obj export (ref demo.py --save_mesh)."""
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
