"""Lightweight multi-person tracker for video HMR.

Capability parity with the reference's tracking entry (ref
`tokenhmr/track.py`, which delegates to the external PHALP package — its
CUDA-dependent appearance model is out of the accelerator path here): the
framework-owned piece is a per-frame batched TokenHMR predictor plus
temporal ID association.  This tracker associates by IoU with constant-
velocity box prediction, plus an optional pose-embedding similarity gate
(cosine distance over the predicted token-logits mean or betas), and
exposes the same "per-frame list of (track_id, box, smpl outputs)" record
stream a PHALP consumer expects.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    return (inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)
            ).astype(np.float32)


@dataclasses.dataclass
class Track:
    track_id: int
    box: np.ndarray                     # (4,) xyxy
    velocity: np.ndarray                # (4,)
    embedding: Optional[np.ndarray]     # appearance/pose embedding
    age: int = 0                        # frames since last match
    hits: int = 1
    history: List[Dict] = dataclasses.field(default_factory=list)

    def predict(self) -> np.ndarray:
        return self.box + self.velocity


class IoUTracker:
    """Greedy IoU association with constant-velocity prediction."""

    def __init__(self, iou_thresh: float = 0.3, max_age: int = 30,
                 min_hits: int = 1, embed_weight: float = 0.25,
                 velocity_smoothing: float = 0.7):
        self.iou_thresh = iou_thresh
        self.max_age = max_age
        self.min_hits = min_hits
        self.embed_weight = embed_weight
        self.vel_smooth = velocity_smoothing
        self.tracks: List[Track] = []
        self._next_id = 1
        self.frame = 0

    def _affinity(self, boxes: np.ndarray,
                  embeds: Optional[np.ndarray]) -> np.ndarray:
        preds = np.stack([t.predict() for t in self.tracks]) if self.tracks \
            else np.zeros((0, 4), np.float32)
        aff = iou_matrix(preds, boxes)
        if (embeds is not None and self.embed_weight > 0 and len(self.tracks)
                and all(t.embedding is not None for t in self.tracks)):
            te = np.stack([t.embedding for t in self.tracks])
            te = te / np.maximum(np.linalg.norm(te, axis=1, keepdims=True), 1e-9)
            de = embeds / np.maximum(
                np.linalg.norm(embeds, axis=1, keepdims=True), 1e-9)
            sim = 0.5 * (te @ de.T + 1.0)
            aff = (1 - self.embed_weight) * aff + self.embed_weight * sim * (aff > 0)
        return aff

    def update(
        self,
        boxes: np.ndarray,                        # (N, 4) xyxy
        embeddings: Optional[np.ndarray] = None,  # (N, E)
        payloads: Optional[Sequence[Dict]] = None,
    ) -> List[Dict]:
        """Associate detections; returns per-detection records with stable
        track ids: {'track_id', 'box', 'payload'}."""
        self.frame += 1
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        aff = self._affinity(boxes, embeddings)

        # greedy best-first matching
        match_pairs: List[tuple] = []
        if aff.size:
            used_t: set = set()
            used_d: set = set()
            for flat in np.argsort(-aff, axis=None):
                ti, di = np.unravel_index(flat, aff.shape)
                if aff[ti, di] < self.iou_thresh:
                    break
                if ti in used_t or di in used_d:
                    continue
                used_t.add(int(ti))
                used_d.add(int(di))
                match_pairs.append((int(ti), int(di)))

        records: List[Dict] = [None] * len(boxes)  # type: ignore
        matched_d = set()
        for ti, di in match_pairs:
            t = self.tracks[ti]
            new_vel = boxes[di] - t.box
            t.velocity = (self.vel_smooth * t.velocity
                          + (1 - self.vel_smooth) * new_vel)
            t.box = boxes[di]
            t.age = 0
            t.hits += 1
            if embeddings is not None:
                t.embedding = embeddings[di]
            payload = payloads[di] if payloads else {}
            t.history.append({"frame": self.frame, "box": boxes[di],
                              **payload})
            records[di] = {"track_id": t.track_id, "box": boxes[di],
                           "payload": payload}
            matched_d.add(di)

        # new tracks for unmatched detections
        for di in range(len(boxes)):
            if di in matched_d:
                continue
            t = Track(
                track_id=self._next_id, box=boxes[di],
                velocity=np.zeros(4, np.float32),
                embedding=embeddings[di] if embeddings is not None else None,
            )
            payload = payloads[di] if payloads else {}
            t.history.append({"frame": self.frame, "box": boxes[di], **payload})
            self.tracks.append(t)
            records[di] = {"track_id": t.track_id, "box": boxes[di],
                           "payload": payload}
            self._next_id += 1

        # age out stale tracks
        for t in self.tracks:
            if t.history and t.history[-1]["frame"] != self.frame:
                t.age += 1
        self.tracks = [t for t in self.tracks if t.age <= self.max_age]
        return records
