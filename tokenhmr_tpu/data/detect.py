"""Pluggable person detection for the demo pipeline.

The reference hard-wires detectron2's ViTDet cascade R-CNN (ref
`demo.py:40-49`, a CUDA/C++ dependency).  Here detection is an interface:
any (image -> boxes xyxy + scores) callable works.  Built-ins:

  * `FileBoxSource` — boxes from a json sidecar ({image_name: [[x1,y1,x2,y2],..]})
  * `FullFrameDetector` — one box covering the frame (single-person media)
  * `HogDetector` — OpenCV HOG+SVM people detector (CPU, no extra deps)

plus `nms_xyxy`, a host-side (pure-numpy) greedy NMS used by all sources;
the NN detector's in-graph peak suppression is the jittable max-pool NMS
in models/detector.py.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

Detector = Callable[[np.ndarray], np.ndarray]  # img -> (N, 5) [x1,y1,x2,y2,score]


def nms_xyxy(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.5) -> np.ndarray:
    """Standard greedy NMS; returns kept indices."""
    if len(boxes) == 0:
        return np.zeros(0, np.int64)
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-9)
        order = order[1:][iou <= iou_thresh]
    return np.asarray(keep, np.int64)


def wbf_xyxy(boxes: np.ndarray, scores: np.ndarray,
             iou_thresh: float = 0.5, n_views: int = 1) -> np.ndarray:
    """Weighted box fusion (Solovyev et al. 2021) for ensemble/TTA merging.

    Unlike NMS (which KEEPS one box per cluster and drops the rest), WBF
    averages each cluster's coordinates with score weights — when several
    views localize the same person imperfectly, the fused box is better
    than any single one.  Confidence is scaled by cross-view agreement
    (mean score * min(n_members, n_views)/n_views), so a box only one of
    `n_views` views fired on is demoted — TTA false positives are rarely
    reproduced across views.

    Returns fused (M, 5) [x1, y1, x2, y2, score], score-sorted.
    """
    if len(boxes) == 0:
        return np.zeros((0, 5), np.float32)
    order = np.argsort(-scores)
    fused: list = []     # per cluster: [weighted coord sum, score sum, n]
    members: list = []   # per cluster: list of member scores
    for i in order:
        b, s = boxes[i], scores[i]
        hit = -1
        for ci, (csum, ssum, n) in enumerate(fused):
            cb = csum / ssum
            xx1 = max(b[0], cb[0]); yy1 = max(b[1], cb[1])
            xx2 = min(b[2], cb[2]); yy2 = min(b[3], cb[3])
            inter = max(xx2 - xx1, 0.0) * max(yy2 - yy1, 0.0)
            a1 = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
            a2 = max(cb[2] - cb[0], 0) * max(cb[3] - cb[1], 0)
            if inter / max(a1 + a2 - inter, 1e-9) > iou_thresh:
                hit = ci
                break
        if hit < 0:
            fused.append([b * s, s, 1])
            members.append([s])
        else:
            fused[hit][0] = fused[hit][0] + b * s
            fused[hit][1] += s
            fused[hit][2] += 1
            members[hit].append(s)
    out = np.zeros((len(fused), 5), np.float32)
    for ci, (csum, ssum, n) in enumerate(fused):
        out[ci, :4] = csum / ssum
        # max member keeps the strongest single-view evidence (a person
        # centered in the frame is whole in ONE view only); the agreement
        # factor demotes single-view boxes when n_views > 1 is requested
        out[ci, 4] = float(np.max(members[ci])) * min(n, n_views) / n_views
    return out[np.argsort(-out[:, 4])]


class FullFrameDetector:
    """One box covering the whole frame (score 1)."""

    def __call__(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        return np.array([[0, 0, w, h, 1.0]], np.float32)


class FileBoxSource:
    """Boxes from a json sidecar: {basename: [[x1,y1,x2,y2(,score)], ...]}."""

    def __init__(self, path: str):
        with open(path) as f:
            self.boxes: Dict[str, List] = json.load(f)
        self._current: Optional[str] = None

    def for_image(self, name: str) -> "FileBoxSource":
        self._current = os.path.basename(name)
        return self

    def __call__(self, img: np.ndarray) -> np.ndarray:
        entries = self.boxes.get(self._current, [])
        out = []
        for e in entries:
            e = list(e) + [1.0] * (5 - len(e))
            out.append(e[:5])
        return np.asarray(out, np.float32).reshape(-1, 5)


class HogDetector:
    """OpenCV HOG people detector (CPU fallback; no native CUDA deps).

    Only available on OpenCV < 5 — cv2 5.0 removed HOGDescriptor (and the
    pretrained Dalal-Triggs SVM with it).  Use the learned `NNDetector`
    instead on modern builds."""

    def __init__(self, score_thresh: float = 0.3, iou_thresh: float = 0.5):
        assert cv2 is not None
        if not hasattr(cv2, "HOGDescriptor"):
            raise RuntimeError(
                "cv2.HOGDescriptor was removed in OpenCV 5; use "
                "--detector nn (learned, tokenhmr_tpu/models/detector.py) "
                "or --detector full_frame / file")
        self.hog = cv2.HOGDescriptor()
        self.hog.setSVMDetector(cv2.HOGDescriptor_getDefaultPeopleDetector())
        self.score_thresh = score_thresh
        self.iou_thresh = iou_thresh

    def __call__(self, img: np.ndarray) -> np.ndarray:
        rects, weights = self.hog.detectMultiScale(
            img[:, :, ::-1], winStride=(8, 8), padding=(8, 8), scale=1.05
        )
        if len(rects) == 0:
            return np.zeros((0, 5), np.float32)
        boxes = np.array(
            [[x, y, x + w, y + h] for (x, y, w, h) in rects], np.float32
        )
        scores = np.asarray(weights, np.float32).reshape(-1)
        keep = scores >= self.score_thresh
        boxes, scores = boxes[keep], scores[keep]
        keep = nms_xyxy(boxes, scores, self.iou_thresh)
        return np.concatenate([boxes[keep], scores[keep, None]], axis=1)


class NNDetector:
    """Learned CenterNet-style person detector (models/detector.py).

    Replaces the reference's detectron2 ViTDet (ref demo.py:40-49).
    Letterboxes to the model's square input, runs ONE jitted
    forward+decode, maps boxes back to source pixels, NMS + threshold.
    """

    def __init__(self, ckpt_path: str, score_thresh: float = 0.35,
                 iou_thresh: float = 0.5, tiles: bool = False):
        import jax
        import jax.numpy as jnp

        from ..models.detector import (
            DetectorConfig, PersonDetector, decode_detections,
        )
        from ..train.checkpoint import load_detector_checkpoint

        self.params, self.cfg = load_detector_checkpoint(ckpt_path)
        self.score_thresh = score_thresh
        self.iou_thresh = iou_thresh
        self.tiles = tiles
        model = PersonDetector(self.cfg)
        cfg = self.cfg

        @jax.jit
        def run(params, img):   # img (1, S, S, 3) float in [0, 1]
            out = model.apply({"params": params}, img)
            return decode_detections(out, cfg)

        self._run = run
        self._jnp = jnp

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if not self.tiles:
            return self.detect_batch([img])[0]
        return self._detect_tiled(img)

    def _detect_tiled(self, img: np.ndarray) -> np.ndarray:
        """Multi-scale test-time tiling: the full letterboxed frame plus a
        2x2 grid of ~60%-size overlapping zoom tiles, fused by weighted
        box fusion.  Small people span few letterbox pixels at high source
        resolutions; the zoom tiles recover them at 5x the forward cost
        (one padded batch dispatch, so latency grows less than 5x).

        Tile detections truncated at an INTERIOR tile border (a border
        that is not also an image border) are dropped: such boxes are
        clipped fragments of a person the tile only partially sees, and
        fusing them drags the merged coordinates inward.  The 20% tile
        overlap keeps most positions whole in at least one view, and the
        full frame always covers the rest.
        """
        h, w = img.shape[:2]
        th, tw = int(round(h * 0.6)), int(round(w * 0.6))
        origins = [(0, 0), (0, w - tw), (h - th, 0), (h - th, w - tw)]
        views = [img] + [img[y:y + th, x:x + tw] for (y, x) in origins]
        dets = self.detect_batch(views)
        merged = [dets[0]]
        pad = 2.0  # px: "touches the border" slack
        for (y, x), d in zip(origins, dets[1:]):
            d = d.copy()
            if len(d):
                trunc = np.zeros(len(d), bool)
                if x > 0:                    # left border is interior
                    trunc |= d[:, 0] < pad
                if x + tw < w:               # right border is interior
                    trunc |= d[:, 2] > tw - pad
                if y > 0:                    # top border is interior
                    trunc |= d[:, 1] < pad
                if y + th < h:               # bottom border is interior
                    trunc |= d[:, 3] > th - pad
                d = d[~trunc]
            d[:, [0, 2]] += x
            d[:, [1, 3]] += y
            merged.append(d)
        allb = np.concatenate(merged, axis=0)
        if len(allb) == 0:
            return allb
        return wbf_xyxy(allb[:, :4], allb[:, 4], self.iou_thresh)

    def detect_batch(self, imgs) -> list:
        """Batched detection: ONE device dispatch for a window of frames
        (padded to a power-of-two batch so XLA compiles few shapes).
        Returns a list of (Mi, 5) [x1,y1,x2,y2,score] arrays.
        """
        S = self.cfg.img_size
        F = len(imgs)
        if F == 0:
            return []
        fb = 1
        while fb < F:
            fb *= 2
        batch = np.zeros((fb, S, S, 3), np.float32)
        scales = []
        for i, img in enumerate(imgs):
            h, w = img.shape[:2]
            scale = S / max(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            batch[i, :nh, :nw] = cv2.resize(img, (nw, nh)) / 255.0
            scales.append(scale)
        boxes_b, scores_b = self._run(self.params, self._jnp.asarray(batch))
        boxes_b, scores_b = np.asarray(boxes_b), np.asarray(scores_b)
        out = []
        for i, img in enumerate(imgs):
            h, w = img.shape[:2]
            boxes = boxes_b[i] / scales[i]
            scores = scores_b[i]
            keep = scores >= self.score_thresh
            boxes, scores = boxes[keep], scores[keep]
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
            keep = nms_xyxy(boxes, scores, self.iou_thresh)
            out.append(np.concatenate(
                [boxes[keep], scores[keep, None]], axis=1).astype(np.float32))
        return out


def make_detector(kind: str, boxes_file: Optional[str] = None,
                  ckpt: Optional[str] = None,
                  tiles: bool = False,
                  score_thresh: float = 0.35) -> Detector:
    if kind == "full_frame":
        return FullFrameDetector()
    if kind == "file":
        assert boxes_file, "--boxes-file required for file detector"
        return FileBoxSource(boxes_file)
    if kind == "hog":
        return HogDetector()
    if kind == "nn":
        assert ckpt, "--detector-ckpt required for the nn detector"
        return NNDetector(ckpt, tiles=tiles, score_thresh=score_thresh)
    raise ValueError(
        f"unknown detector {kind!r} (full_frame | file | hog | nn)")
