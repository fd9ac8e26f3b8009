"""PCK keypoint accuracy (ref `tokenhmr/lib/utils/pck_accuracy.py`,
OpenMMLab-port semantics): per-keypoint distances normalized by a per-sample
scale, accuracy = fraction under threshold."""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _calc_distances(preds: np.ndarray, targets: np.ndarray,
                    mask: np.ndarray, norm_factor: np.ndarray) -> np.ndarray:
    """(N, K, D) -> (K, N) normalized distances; -1 where invalid."""
    N, K, _ = preds.shape
    _mask = mask.copy().astype(bool)
    _mask[np.where((norm_factor == 0).sum(1))[0], :] = False
    distances = np.full((N, K), -1, dtype=np.float32)
    nf = norm_factor.reshape(N, 1, -1)
    valid = _mask
    diff = (preds - targets) / nf
    distances[valid] = np.linalg.norm(diff[valid], axis=-1)
    return distances.T


def _distance_acc(distances: np.ndarray, thr: float = 0.5) -> float:
    """Accuracy over valid entries; -1 if none valid."""
    valid = distances != -1
    if valid.sum() > 0:
        return float((distances[valid] < thr).mean())
    return -1.0


def keypoint_pck_accuracy(
    pred: np.ndarray,        # (N, K, 2)
    gt: np.ndarray,          # (N, K, 2)
    mask: np.ndarray,        # (N, K) bool
    thr: float,
    norm_factor: np.ndarray,  # (N, 2)
) -> Tuple[np.ndarray, float, int]:
    """Returns (per-keypoint acc (K,), mean acc, #valid keypoints)."""
    distances = _calc_distances(pred, gt, mask, norm_factor)
    acc = np.array([_distance_acc(d, thr) for d in distances])
    valid = acc >= 0
    cnt = int(valid.sum())
    avg = float(acc[valid].mean()) if cnt else 0.0
    return acc, avg, cnt
