"""Training-data quality filters.

Capabilities of ref `tokenhmr/lib/datasets/image_dataset.py:309-421`
(suppress/filter maps) and `smplh_prob_filter.py` (the AMASS pose-
probability filter: 21x100^3 smoothed joint-angle histogram lookup).
All pure numpy, applied per-item in the tar pipeline.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

try:
    from scipy.ndimage import gaussian_filter
except ImportError:  # pragma: no cover
    gaussian_filter = None

# ref smplh_prob_filter.py:32-56 — per-joint probability thresholds
JOINT_PROB_THRESHOLDS = np.array(
    [5e-5, 5e-5, 2e-3, 5e-6, 5e-6, 0.01, 5e-6, 5e-6, 0.025, 0.0, 0.0,
     2e-4, 4.5e-4, 4.5e-4, 5e-4, 2e-4, 2e-4, 4e-5, 4e-5, 1e-3, 1e-3],
    dtype=np.float32,
)
POSE_RANGE_MIN, POSE_RANGE_MAX = -np.pi, np.pi


def load_amass_hist_smooth(path: str, sigma: float = 2.0) -> np.ndarray:
    """(21, 100, 100, 100) AMASS joint-angle histogram -> smoothed density
    (ref smplh_prob_filter.py:78-90)."""
    hist = np.load(path).astype(np.float64)
    assert hist.shape[0] == 21 and hist.ndim == 4
    nbins = hist.shape[1]
    hist = hist / hist.sum() / (2 * np.pi / nbins) ** 3
    if gaussian_filter is not None:
        hist = gaussian_filter(hist, sigma=sigma, mode="constant")
    return hist.astype(np.float32)


def normalize_axis_angle(poses: np.ndarray) -> np.ndarray:
    """Wrap angles into [-pi, pi] keeping the rotation (ref :93-117)."""
    poses = poses.reshape(-1, 3).astype(np.float64)
    angle = np.linalg.norm(poses, axis=1)
    axis = poses / np.maximum(angle[:, None], 1e-8)
    eps = 1e-6
    while True:
        too_big = angle > np.pi + eps
        if not too_big.any():
            break
        angle = np.where(too_big, angle - 2 * np.pi, angle)
        too_small = angle < -eps
        axis = np.where(too_small[:, None], -axis, axis)
        angle = np.where(too_small, -angle, angle)
    return (axis * angle[:, None]).astype(np.float32)


def poses_check_probable(
    body_pose_69: np.ndarray,
    hist_smooth: np.ndarray,
    thresholds: np.ndarray = JOINT_PROB_THRESHOLDS,
) -> bool:
    """True if all 21 body-joint angles land in probable histogram bins
    (ref :120-148).  body_pose_69: (69,) SMPL body pose (first 63 used)."""
    poses = normalize_axis_angle(body_pose_69[:63]).reshape(21, 3)
    nbins = hist_smooth.shape[1]
    bins = (poses - POSE_RANGE_MIN) / (POSE_RANGE_MAX - POSE_RANGE_MIN) * (nbins - 1e-6)
    bins = np.clip(bins.astype(np.int64), 0, nbins - 1)
    prob = hist_smooth[np.arange(21), bins[:, 0], bins[:, 1], bins[:, 2]]
    bad = ((poses < POSE_RANGE_MIN) | (poses >= POSE_RANGE_MAX)).any(axis=1)
    prob = np.where(bad, 0.0, prob)
    return bool((prob > thresholds).all())


# ---------------------------------------------------------------------------
# Per-item maps / selectors (ref image_dataset.py:309-371).  Items are the
# per-person dicts of the tar pipeline: {'keypoints_2d', 'betas',
# 'has_betas', 'body_pose', 'has_body_pose', 'scale', 'extra_info', ...}
# ---------------------------------------------------------------------------

def suppress_bad_kps(data: Dict, thresh: float = 0.0) -> Dict:
    if thresh > 0:
        kp2d = data["keypoints_2d"]
        conf = np.where(kp2d[:, 2] < thresh, 0.0, kp2d[:, 2])
        data["keypoints_2d"] = np.concatenate([kp2d[:, :2], conf[:, None]], 1)
    return data


def suppress_bad_betas(data: Dict, thresh: float = 3.0) -> Dict:
    if thresh > 0 and data["has_betas"]:
        if (np.abs(data["betas"]) > thresh).any():
            data["has_betas"] = np.array(0.0, np.float32)
    return data


def suppress_bad_poses(data: Dict, hist_smooth: Optional[np.ndarray]) -> Dict:
    if hist_smooth is not None and data["has_body_pose"]:
        if not poses_check_probable(data["body_pose"][3:], hist_smooth):
            data["has_body_pose"] = np.array(0.0, np.float32)
    return data


def poses_betas_simultaneous(data: Dict) -> Dict:
    both = float((data["has_body_pose"] > 0) and (data["has_betas"] > 0))
    data["has_body_pose"] = np.array(both, np.float32)
    data["has_betas"] = np.array(both, np.float32)
    return data


def set_betas_for_reg(data: Dict) -> Dict:
    if not (data["has_betas"] > 0):
        data["has_betas"] = np.array(1.0, np.float32)
        data["betas"] = data["betas"] * 0
    return data


def filter_numkp(data: Dict, numkp: int = 4, thresh: float = 0.0) -> bool:
    return (data["keypoints_2d"][:, 2] > thresh).sum() > numkp


def filter_reproj_error(data: Dict, thresh: float = 10 ** 4.5) -> bool:
    extra = data.get("extra_info", {})
    losses = extra.get("fitting_loss", None)
    if losses is None:
        return True
    if isinstance(losses, np.ndarray):
        losses = losses.item()
    reproj = losses.get("reprojection_loss", None)
    return reproj is None or reproj < thresh


def filter_bbox_size(data: Dict, thresh: float = 1.0) -> bool:
    return float(np.min(data["scale"])) * 200.0 > thresh


def filter_no_poses(data: Dict) -> bool:
    return bool(data["has_body_pose"] > 0)
