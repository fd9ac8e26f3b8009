"""Full-frame multi-person serving pipeline (BASELINE config 4).

One jitted program: full frame + N box affines -> on-device crop-warp ->
backbone -> head -> SMPL -> full-image cameras.  The host does JPEG decode
and box->affine math only; the frame crosses H2D once regardless of N.

The per-call crop count is padded to fixed buckets so XLA compiles a small
number of shapes (people-per-frame varies every frame).
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.smpl import SMPLModel
from .models.tokenhmr import TokenHMRConfig, forward_step
from .ops.crop import bbox_xyxy_to_center_scale, expand_to_aspect_ratio
from .ops.projection import cam_crop_to_full
from .ops.warp import (crop_affines_for_boxes, warp_crops_device,
                       warp_crops_device_multi)

DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32)
DEFAULT_BATCH_BUCKETS = (8, 16, 32, 64, 128)
DEFAULT_FRAME_BUCKETS = (4, 8, 16, 32)


class FullFramePipeline:
    """Callable: (frame RGB uint8, boxes xyxy) -> per-person outputs."""

    def __init__(
        self,
        params,
        frozen,
        cfg: TokenHMRConfig,
        smpl_model: SMPLModel,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
    ):
        self.params = params
        self.frozen = frozen
        self.cfg = cfg
        self.smpl = smpl_model
        self.buckets = tuple(sorted(buckets))
        self.crop_size = max(cfg.vit.img_size)

        @functools.partial(jax.jit, static_argnames=())
        def _run(params, frame, affines, centers, sizes, img_wh, scaled_focal):
            crops = warp_crops_device(
                frame, affines, (self.crop_size, self.crop_size)
            )
            out = forward_step(params, self.frozen, self.cfg, self.smpl, crops)
            cam_full = cam_crop_to_full(
                out["pred_cam"], centers, sizes, img_wh, scaled_focal
            )
            return {
                "pred_vertices": out["pred_vertices"],
                "pred_cam_t_full": cam_full,
                "pred_keypoints_3d": out["pred_keypoints_3d"],
                "pred_smpl_params": out["pred_smpl_params"],
                "pred_cam": out["pred_cam"],
            }

        self._run = _run

        @functools.partial(jax.jit, static_argnames=())
        def _run_multi(params, frames, affines, frame_idx, centers, sizes,
                       img_wh, scaled_focal):
            crops = warp_crops_device_multi(
                frames, affines, frame_idx,
                (self.crop_size, self.crop_size))
            out = forward_step(params, self.frozen, self.cfg, self.smpl,
                               crops)
            cam_full = cam_crop_to_full(
                out["pred_cam"], centers, sizes, img_wh, scaled_focal)
            return {
                "pred_vertices": out["pred_vertices"],
                "pred_cam_t_full": cam_full,
                "pred_keypoints_3d": out["pred_keypoints_3d"],
                "pred_smpl_params": out["pred_smpl_params"],
                "pred_cam": out["pred_cam"],
            }

        self._run_multi = _run_multi

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def __call__(self, frame: np.ndarray, boxes: np.ndarray) -> Dict:
        """frame (H, W, 3) uint8 RGB; boxes (N, 4) xyxy.  Returns device
        outputs sliced to the true N."""
        H, W = frame.shape[:2]
        n = len(boxes)
        if n == 0:
            return {}
        centers, scales = bbox_xyxy_to_center_scale(boxes[:, :4])
        sizes = np.array([
            expand_to_aspect_ratio(s * 200.0, (192, 256)).max() for s in scales
        ], np.float32)
        affines = crop_affines_for_boxes(centers, sizes, self.crop_size)

        b = self._bucket(n)
        pad = b - n
        if pad:
            affines = np.concatenate([affines, np.tile(affines[-1:], (pad, 1, 1))])
            centers = np.concatenate([centers, np.tile(centers[-1:], (pad, 1))])
            sizes = np.concatenate([sizes, np.tile(sizes[-1:], pad)])
        img_wh = np.tile([[W, H]], (b, 1)).astype(np.float32)

        scaled_focal = self.cfg.focal_length / self.crop_size * max(H, W)
        out = self._run(
            self.params, jnp.asarray(frame), jnp.asarray(affines),
            jnp.asarray(centers.astype(np.float32)), jnp.asarray(sizes),
            jnp.asarray(img_wh), jnp.float32(scaled_focal),
        )
        return jax.tree_util.tree_map(lambda x: np.asarray(x[:n]), out)

    # -- cross-frame dynamic batching ------------------------------------
    # One device dispatch per WINDOW of frames instead of per frame: all
    # windows' crops run as a single padded batch, so per-dispatch latency
    # (large on tunneled/remote backends, nonzero everywhere) amortizes
    # across the window and the model always sees an MXU-efficient batch.

    def _frame_bucket(self, f: int) -> int:
        for b in DEFAULT_FRAME_BUCKETS:
            if f <= b:
                return b
        return DEFAULT_FRAME_BUCKETS[-1]

    def _crop_bucket(self, n: int) -> int:
        for b in DEFAULT_BATCH_BUCKETS:
            if n <= b:
                return b
        return DEFAULT_BATCH_BUCKETS[-1]

    def run_frames(self, frames: Sequence[np.ndarray],
                   boxes_list: Sequence[np.ndarray]) -> list:
        """frames: list of (Hi, Wi, 3) uint8 RGB; boxes_list: matching
        list of (Ni, 4) xyxy.  Returns a list of per-frame output dicts
        (empty dict for frames with no boxes).  Frames are padded to the
        window's max H/W, crops to a fixed bucket; one jitted program
        handles warp + forward + full-image cameras for the whole window.
        """
        assert len(frames) == len(boxes_list)
        F = len(frames)
        if F == 0:
            return []
        maxH = max(f.shape[0] for f in frames)
        maxW = max(f.shape[1] for f in frames)
        fb = self._frame_bucket(F)
        stack = np.zeros((fb, maxH, maxW, 3), np.uint8)
        for i, f in enumerate(frames):
            stack[i, :f.shape[0], :f.shape[1]] = f

        affs, ctrs, szs, wh, fidx, sfoc, owners = [], [], [], [], [], [], []
        for i, (f, boxes) in enumerate(zip(frames, boxes_list)):
            if boxes is None or len(boxes) == 0:
                continue
            H, W = f.shape[:2]
            centers, scales = bbox_xyxy_to_center_scale(boxes[:, :4])
            sizes = np.array([
                expand_to_aspect_ratio(s * 200.0, (192, 256)).max()
                for s in scales], np.float32)
            affs.append(crop_affines_for_boxes(centers, sizes,
                                               self.crop_size))
            ctrs.append(centers.astype(np.float32))
            szs.append(sizes)
            wh.append(np.tile([[W, H]], (len(boxes), 1)).astype(np.float32))
            fidx.append(np.full(len(boxes), i, np.int32))
            sfoc.append(np.full(
                len(boxes),
                self.cfg.focal_length / self.crop_size * max(H, W),
                np.float32))
            owners.append((i, len(boxes)))
        if not owners:
            return [{} for _ in range(F)]

        cat = lambda xs: np.concatenate(xs, axis=0)
        affines, centers, sizes = cat(affs), cat(ctrs), cat(szs)
        img_wh, frame_idx, scaled_focal = cat(wh), cat(fidx), cat(sfoc)
        n = len(affines)
        b = self._crop_bucket(n)
        pad = b - n
        if pad:
            rep = lambda a: np.concatenate(
                [a, np.repeat(a[-1:], pad, axis=0)], axis=0)
            affines, centers, sizes = rep(affines), rep(centers), rep(sizes)
            img_wh, frame_idx, scaled_focal = (
                rep(img_wh), rep(frame_idx), rep(scaled_focal))

        out = self._run_multi(
            self.params, jnp.asarray(stack), jnp.asarray(affines),
            jnp.asarray(frame_idx), jnp.asarray(centers),
            jnp.asarray(sizes), jnp.asarray(img_wh),
            jnp.asarray(scaled_focal))
        out = jax.tree_util.tree_map(np.asarray, out)

        results = [{} for _ in range(F)]
        off = 0
        for i, cnt in owners:
            results[i] = jax.tree_util.tree_map(
                lambda x, o=off, c=cnt: x[o:o + c], out)
            off += cnt
        return results
