"""Benchmark evaluator: MPJPE / PA-MPJPE / PVE accumulation.

Capabilities of ref `tokenhmr/lib/utils/pose_utils.py:145-276` with the two
pelvis-centering protocols:
  * EMDB: SMPL-24 joints regressed from vertices, mid-hip (J1+J2)/2 centering
  * 3DPW-style: dataset-provided keypoint list + pelvis index centering

The per-batch metric math runs jitted on device (Procrustes included); the
accumulator is a host-side ring so evaluation streams at device speed.
Multi-host: each process evaluates its shard and `merge()` combines.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.procrustes import eval_pose

# H36M joint remaps (ref tokenhmr/lib/models/tokenhmr.py:27-28)
H36M_TO_J17 = [6, 5, 4, 1, 2, 3, 16, 15, 14, 11, 12, 13, 8, 10, 0, 7, 9]
H36M_TO_J14 = H36M_TO_J17[:14]


@functools.partial(jax.jit, static_argnames=("keypoint_list", "pelvis_ind"))
def _metrics_pelvis_idx(
    pred_kp3d, gt_kp3d, pred_vertices, gt_vertices,
    keypoint_list: tuple, pelvis_ind: int,
):
    """3DPW-style: center on a single pelvis keypoint (ref :233-247)."""
    kp = jnp.asarray(keypoint_list)
    pred = pred_kp3d - pred_kp3d[:, pelvis_ind : pelvis_ind + 1]
    gt = gt_kp3d - gt_kp3d[:, pelvis_ind : pelvis_ind + 1]
    mpjpe, re = eval_pose(pred[:, kp], gt[:, kp])
    pv = pred_vertices - pred_kp3d[:, pelvis_ind : pelvis_ind + 1]
    gv = gt_vertices - gt_kp3d[:, pelvis_ind : pelvis_ind + 1]
    pve = jnp.sqrt(jnp.sum((pv - gv) ** 2, axis=-1)).mean(axis=-1) * 1000.0
    return mpjpe, re, pve


@functools.partial(jax.jit, static_argnames=("keypoint_list",))
def _metrics_midhip(
    pred_vertices, gt_vertices, J_regressor_24, keypoint_list: tuple
):
    """EMDB-style: J24 from vertices, mid-hip centering (ref :210-231)."""
    kp = jnp.asarray(keypoint_list)
    gt_j = jnp.einsum("jv,bvd->bjd", J_regressor_24, gt_vertices)
    pred_j = jnp.einsum("jv,bvd->bjd", J_regressor_24, pred_vertices)
    gt_pelvis = (gt_j[:, 1:2] + gt_j[:, 2:3]) / 2.0
    pred_pelvis = (pred_j[:, 1:2] + pred_j[:, 2:3]) / 2.0
    gt_j = gt_j - gt_pelvis
    pred_j = pred_j - pred_pelvis
    gv = gt_vertices - gt_pelvis
    pv = pred_vertices - pred_pelvis
    mpjpe, re = eval_pose(pred_j[:, kp], gt_j[:, kp])
    pve = jnp.sqrt(jnp.sum((pv - gv) ** 2, axis=-1)).mean(axis=-1) * 1000.0
    return mpjpe, re, pve


class Evaluator:
    """Streaming metric accumulator (ref pose_utils.py:145-276)."""

    METRICS = ("mode_mpjpe", "mode_re", "mode_pve")

    def __init__(
        self,
        dataset_length: int,
        keypoint_list: Sequence[int],
        pelvis_ind: int = 39,
        metrics: Sequence[str] = METRICS,
        J_regressor_24: Optional[np.ndarray] = None,
        dataset: str = "",
    ):
        self.dataset_length = dataset_length
        self.keypoint_list = tuple(int(k) for k in keypoint_list)
        self.pelvis_ind = pelvis_ind
        self.metrics = list(metrics)
        self.dataset = dataset
        self.J_regressor_24 = (
            jnp.asarray(J_regressor_24) if J_regressor_24 is not None else None
        )
        self.acc = {m: np.zeros(dataset_length) for m in self.metrics}
        self.counter = 0
        self.imgnames: List[str] = []

    def __call__(self, output: Dict, batch: Dict) -> Dict[str, np.ndarray]:
        self.imgnames += list(batch.get("imgname", []))
        if "EMDB" in self.dataset:
            assert self.J_regressor_24 is not None
            mpjpe, re, pve = _metrics_midhip(
                output["pred_vertices"], batch["vertices"],
                self.J_regressor_24, tuple(self.keypoint_list),
            )
        else:
            gt_kp3d = batch["keypoints_3d"]
            if gt_kp3d.shape[-1] == 4:
                gt_kp3d = gt_kp3d[..., :-1]
            mpjpe, re, pve = _metrics_pelvis_idx(
                output["pred_keypoints_3d"], gt_kp3d,
                output["pred_vertices"], batch["vertices"],
                tuple(self.keypoint_list), self.pelvis_ind,
            )
        vals = {"mode_mpjpe": np.asarray(mpjpe), "mode_re": np.asarray(re),
                "mode_pve": np.asarray(pve)}
        bs = vals["mode_mpjpe"].shape[0]
        for m in self.metrics:
            self.acc[m][self.counter : self.counter + bs] = vals[m][:self.dataset_length - self.counter]
        self.counter += bs
        return {m: vals[m] for m in self.metrics}

    def get_metrics_dict(self) -> Dict[str, float]:
        return {m: float(self.acc[m][: self.counter].mean()) for m in self.metrics}

    def log(self) -> str:
        if self.counter == 0:
            return "Evaluation has not started"
        lines = [f"{self.counter} / {self.dataset_length} samples"]
        for m, v in self.get_metrics_dict().items():
            lines.append(f"{m}: {v:.2f} mm")
        return "\n".join(lines)

    def merge(self, other: "Evaluator") -> None:
        """Combine another process's shard (multi-host eval)."""
        for m in self.metrics:
            self.acc[m][self.counter : self.counter + other.counter] = (
                other.acc[m][: other.counter]
            )
        self.counter += other.counter
        self.imgnames += other.imgnames
