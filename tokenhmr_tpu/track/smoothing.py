"""Temporal smoothing of per-track SMPL parameters (video tracking).

The reference's demo videos get temporal stability from PHALP's internal
temporal model (ref `tokenhmr/track.py:33-46` overrides PHALP's pose with
TokenHMR's per-frame prediction, inheriting PHALP's smoothing of the
track state).  Here the framework owns the whole stack, so smoothing is
explicit: a One-Euro filter (Casiez et al., CHI 2012 — the standard
low-latency jitter filter for pose streams) applied per track to

  * rotations in the 6D representation (global orient + 23 body joints),
    re-orthonormalized through the Gram-Schmidt 6D->matrix map afterwards
    so outputs stay valid rotations,
  * betas, and the full-frame camera translation.

Pure numpy, host-side: smoothing operates on per-track scalars at video
frame rate — nowhere near the accelerator path.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


def _alpha(cutoff: np.ndarray | float, freq: float) -> np.ndarray:
    tau = 1.0 / (2.0 * np.pi * np.asarray(cutoff, np.float64))
    te = 1.0 / freq
    return (1.0 / (1.0 + tau / te)).astype(np.float32)


@dataclasses.dataclass
class OneEuroFilter:
    """Elementwise One-Euro filter over an arbitrary-shape float array.

    min_cutoff: jitter floor (Hz) — lower = smoother when still.
    beta: speed coefficient — higher = less lag under fast motion.
    """

    freq: float = 30.0
    min_cutoff: float = 1.0
    beta: float = 0.5
    d_cutoff: float = 1.0
    _x: Optional[np.ndarray] = None
    _dx: Optional[np.ndarray] = None

    def __call__(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        if self._x is None:
            self._x = x.copy()
            self._dx = np.zeros_like(x)
            return x
        dx = (x - self._x) * self.freq
        a_d = _alpha(self.d_cutoff, self.freq)
        self._dx = a_d * dx + (1 - a_d) * self._dx
        cutoff = self.min_cutoff + self.beta * np.abs(self._dx)
        a = _alpha(cutoff, self.freq)
        self._x = a * x + (1 - a) * self._x
        return self._x.copy()


def _mat_to_6d(R: np.ndarray) -> np.ndarray:
    """(..., 3, 3) -> (..., 6), TokenHMR row convention (first two rows)."""
    return R[..., :2, :].reshape(*R.shape[:-2], 6)


def _6d_to_mat(x: np.ndarray) -> np.ndarray:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (row convention), so any
    filtered 6D vector maps back to a valid rotation."""
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / np.maximum(np.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - np.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / np.maximum(np.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = np.cross(b1, b2)
    return np.stack([b1, b2, b3], axis=-2)


class SMPLSmoother:
    """Per-track One-Euro smoothing of TokenHMR outputs.

    update() takes one person's raw params for the current frame and
    returns the smoothed versions; independent filter state is kept per
    track id and per quantity.  Call prune(live_ids) occasionally to drop
    state of dead tracks.
    """

    def __init__(self, freq: float = 30.0, min_cutoff: float = 1.0,
                 beta: float = 0.5):
        self._mk = lambda: OneEuroFilter(freq=freq, min_cutoff=min_cutoff,
                                         beta=beta)
        self._filters: Dict[int, Dict[str, OneEuroFilter]] = {}

    def update(
        self,
        track_id: int,
        global_orient: np.ndarray,   # (1, 3, 3)
        body_pose: np.ndarray,       # (23, 3, 3)
        betas: np.ndarray,           # (10,)
        cam_t: np.ndarray,           # (3,)
    ):
        f = self._filters.setdefault(track_id, {
            "pose": self._mk(), "betas": self._mk(), "cam_t": self._mk(),
        })
        pose6 = _mat_to_6d(np.concatenate([global_orient, body_pose], axis=0))
        pose6 = f["pose"](pose6)
        R = _6d_to_mat(pose6)
        return (R[:1], R[1:], f["betas"](np.asarray(betas, np.float32)),
                f["cam_t"](np.asarray(cam_t, np.float32)))

    def prune(self, live_ids) -> None:
        live = set(int(i) for i in live_ids)
        for tid in list(self._filters):
            if tid not in live:
                del self._filters[tid]
