"""AMASS/MOYO pose datasets for PoseVQ tokenizer training.

Capabilities of ref `tokenization/dataset/dataset_poseVQ.py` (VQPoseDataset,
MixedTrainDataset random-partition mixing, cycle iterator) and
`tokenization/scripts/prepare_*.py` (mocap npz -> per-dataset pose arrays).

Each item is a (21, 3, 3) body-pose rotation-matrix array; the reference's
on-the-fly per-item SMPLH forward (`dataset_poseVQ.py:111-113`) is gone —
GT meshes come from the batched on-device forward in the loss
(train/tokenizer.py).
"""
from __future__ import annotations

import dataclasses
import glob
import os
from typing import Iterator, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.rotations import axis_angle_to_matrix


def _aa_to_rotmat_np(pose_body: np.ndarray) -> np.ndarray:
    """(N, 63) axis-angle -> (N, 21, 3, 3), batched through jax on host."""
    aa = jnp.asarray(pose_body.reshape(-1, 21, 3))
    return np.asarray(axis_angle_to_matrix(aa))


class PoseDataset:
    """Poses from one or more npz files with `pose_body` (N, 63) arrays
    (the layout `prepare_amass_smplh_pose.py` emits)."""

    def __init__(self, npz_paths: Sequence[str]):
        arrays = []
        for p in npz_paths:
            d = np.load(p, allow_pickle=True)
            key = "pose_body" if "pose_body" in d else "poses"
            arr = np.asarray(d[key], np.float32)
            if arr.shape[1] > 63:       # full smplh pose: body is [3:66]
                arr = arr[:, 3:66]
            arrays.append(arr)
        self.pose_body = np.concatenate(arrays, 0) if arrays else np.zeros((0, 63), np.float32)

    def __len__(self):
        return len(self.pose_body)

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.pose_body[idx]


class MixedPoseDataset:
    """Weighted random-partition mix (ref MixedTrainDataset :51-69): each
    epoch-sized virtual index space is partitioned over datasets by weight."""

    def __init__(self, datasets: Sequence[PoseDataset], weights: Sequence[float],
                 seed: int = 0):
        assert len(datasets) == len(weights)
        w = np.asarray(weights, np.float64)
        self.partition = np.cumsum(w / w.sum())
        self.datasets = list(datasets)
        self.rng = np.random.default_rng(seed)
        self.length = sum(len(d) for d in datasets)

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> np.ndarray:
        u = self.rng.random()
        di = int(np.searchsorted(self.partition, u))
        di = min(di, len(self.datasets) - 1)
        d = self.datasets[di]
        return d[self.rng.integers(len(d))]


def pose_batches(
    dataset, batch_size: int, seed: int = 0, shuffle: bool = True,
) -> Iterator[np.ndarray]:
    """Infinite (cycle) iterator of (B, 21, 3, 3) rotmat batches
    (ref `cycle` :181-184)."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    while True:
        idxs = rng.integers(n, size=batch_size) if shuffle else np.arange(batch_size) % n
        flat = np.stack([dataset[int(i)] for i in idxs])
        yield _aa_to_rotmat_np(flat)


def eval_pose_batches(dataset, batch_size: int) -> Iterator[np.ndarray]:
    n = len(dataset)
    for s in range(0, n - batch_size + 1, batch_size):
        flat = np.stack([dataset[i] for i in range(s, s + batch_size)])
        yield _aa_to_rotmat_np(flat)


# ---------------------------------------------------------------------------
# Data preparation (ref tokenization/scripts/prepare_amass_smplh_pose.py)
# ---------------------------------------------------------------------------

def prepare_amass_poses(
    amass_root: str,
    out_path: str,
    datasets: Optional[Sequence[str]] = None,
    trim_fraction: float = 0.2,
    stride: int = 10,
) -> int:
    """Walk AMASS npz sequences, trim 20% at both ends, subsample by stride,
    save one npz with pose_body (N, 63) (ref prepare script :48-92)."""
    seqs = []
    roots = ([os.path.join(amass_root, d) for d in datasets]
             if datasets else [amass_root])
    for root in roots:
        for path in sorted(glob.glob(os.path.join(root, "**", "*.npz"),
                                     recursive=True)):
            try:
                d = np.load(path)
            except Exception:
                continue
            if "poses" not in d:
                continue
            poses = np.asarray(d["poses"], np.float32)
            n = len(poses)
            lo, hi = int(n * trim_fraction), int(n * (1 - trim_fraction))
            poses = poses[lo:hi:stride]
            if len(poses):
                seqs.append(poses[:, 3:66])
    all_poses = np.concatenate(seqs, 0) if seqs else np.zeros((0, 63), np.float32)
    np.savez(out_path, pose_body=all_poses)
    return len(all_poses)
