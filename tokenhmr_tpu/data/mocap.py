"""Unpaired mocap {body_pose, betas} dataset for the GAN prior.

Capability of ref `tokenhmr/lib/datasets/mocap_dataset.py` (CMU mocap npz).
"""
from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


class MoCapDataset:
    def __init__(self, dataset_file: str):
        data = np.load(dataset_file)
        self.pose = data["body_pose"].astype(np.float32)[:, 3:]  # (N, 69)
        self.betas = data["betas"].astype(np.float32)            # (N, 10)
        self.length = len(self.pose)

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return {"body_pose": self.pose[idx], "betas": self.betas[idx]}


class SyntheticMoCap:
    """Stand-in prior (smoke tests without the CMU npz)."""

    def __init__(self, n: int = 1024, seed: int = 0):
        rng = np.random.RandomState(seed)
        self.pose = (rng.randn(n, 69) * 0.25).astype(np.float32)
        self.betas = (rng.randn(n, 10) * 0.8).astype(np.float32)
        self.length = n

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        return {"body_pose": self.pose[idx], "betas": self.betas[idx]}


def mocap_batches(dataset, batch_size: int, seed: int = 0) -> Iterator[Dict]:
    rng = np.random.default_rng(seed)
    while True:
        idx = rng.integers(len(dataset), size=batch_size)
        yield {
            "body_pose": np.stack([dataset[int(i)]["body_pose"] for i in idx]),
            "betas": np.stack([dataset[int(i)]["betas"] for i in idx]),
        }
