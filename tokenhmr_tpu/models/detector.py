"""Learned single-shot person detector (CenterNet-style, anchor-free).

Replaces the reference's detectron2 ViTDet cascade R-CNN person detector
(ref `tokenhmr/demo.py:40-49`, `lib/configs/cascade_mask_rcnn_vitdet_h_75ep
.py`) with a TPU-first design: one fully-convolutional forward + a jittable
peak-NMS decode (3x3 max-pool), no proposal stage, no dynamic shapes.

Heads (CenterNet): center heatmap (person class), box size (w, h) and
sub-stride center offset, all at output stride 4.

Weights: this container has no internet and no pretrained person model of
ANY kind (cv2 5.0 even dropped HOGDescriptor), so shipped weights are
trained on procedural articulated-human composites
(`tokenhmr_tpu/data/synth_people.py`) via `cli/train_detector.py` — an
honest stopgap; the same CLI trains on real COCO-person npz data when
available.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    img_size: int = 256          # square letterboxed input
    base: int = 32               # stem width
    stride: int = 4              # output stride (centernet standard)
    max_det: int = 16            # top-k peaks kept
    wh_log: bool = False         # size head regresses log(wh) (scale-
    #                              invariant across the widened 0.15-1.15
    #                              person-scale band); False matches pre-r3
    #                              checkpoints, which omit the field
    p32: bool = False            # extra /32 pyramid level: doubles the
    #                              receptive field so near-frame-height
    #                              people (~1.15*256 px) fit inside it;
    #                              False matches pre-r3 checkpoints
    dtype: jnp.dtype = jnp.float32

    @property
    def out_hw(self) -> int:
        return self.img_size // self.stride


class ConvBlock(nn.Module):
    ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.ch), dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class PersonDetector(nn.Module):
    """(B, S, S, 3) in [0,1] -> {'heat' (B,h,w,1), 'wh' (B,h,w,2),
    'off' (B,h,w,2)} at stride 4."""

    cfg: DetectorConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        b = c.base
        x = x.astype(c.dtype)
        x = ConvBlock(b, 2, c.dtype)(x, train)          # /2
        x = ConvBlock(b * 2, 2, c.dtype)(x, train)      # /4
        s4 = ConvBlock(b * 2, 1, c.dtype)(x, train)
        x = ConvBlock(b * 4, 2, c.dtype)(s4, train)     # /8
        s8 = ConvBlock(b * 4, 1, c.dtype)(x, train)
        x = ConvBlock(b * 8, 2, c.dtype)(s8, train)     # /16
        x = ConvBlock(b * 8, 1, c.dtype)(x, train)
        if c.p32:
            s16 = x
            x = ConvBlock(b * 8, 2, c.dtype)(s16, train)  # /32
            x = ConvBlock(b * 8, 1, c.dtype)(x, train)
            x = _upsample2(x) + nn.Conv(b * 8, (1, 1), dtype=c.dtype)(s16)
            x = ConvBlock(b * 8, 1, c.dtype)(x, train)
        # top-down fusion back to /4 (nearest upsample + 1x1 lateral)
        x = _upsample2(x) + nn.Conv(b * 8, (1, 1), dtype=c.dtype)(s8)
        x = ConvBlock(b * 4, 1, c.dtype)(x, train)
        x = _upsample2(x) + nn.Conv(b * 4, (1, 1), dtype=c.dtype)(s4)
        x = ConvBlock(b * 2, 1, c.dtype)(x, train)
        heat = nn.Conv(1, (3, 3), dtype=jnp.float32,
                       bias_init=nn.initializers.constant(-2.19),  # focal prior
                       name="head_heat")(x)
        wh = nn.Conv(2, (3, 3), dtype=jnp.float32, name="head_wh")(x)
        off = nn.Conv(2, (3, 3), dtype=jnp.float32, name="head_off")(x)
        return {"heat": heat, "wh": wh, "off": off}


def _upsample2(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


# ---------------------------------------------------------------------------
# Decode: sigmoid -> 3x3 max-pool peak NMS -> top-k -> boxes. Static shapes
# throughout; invalid detections carry score 0.
# ---------------------------------------------------------------------------

def decode_detections(out: Dict[str, jax.Array], cfg: DetectorConfig
                      ) -> Tuple[jax.Array, jax.Array]:
    """-> boxes (B, K, 4) xyxy in INPUT pixels, scores (B, K)."""
    heat = jax.nn.sigmoid(out["heat"][..., 0])            # (B, h, w)
    pooled = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)])
    peaks = jnp.where(heat >= pooled, heat, 0.0)
    B, h, w = peaks.shape
    flat = peaks.reshape(B, h * w)
    scores, idx = jax.lax.top_k(flat, cfg.max_det)        # (B, K)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    gather = lambda m: jnp.take_along_axis(
        m.reshape(B, h * w, m.shape[-1]), idx[..., None], axis=1)
    off = gather(out["off"])                              # (B, K, 2)
    wh = gather(out["wh"])                                # (B, K, 2)
    wh = jnp.exp(wh) if cfg.wh_log else jnp.maximum(wh, 0.0)
    cx = (xs + off[..., 0]) * cfg.stride
    cy = (ys + off[..., 1]) * cfg.stride
    bw = wh[..., 0] * cfg.stride
    bh = wh[..., 1] * cfg.stride
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                      axis=-1)
    return boxes, scores


# ---------------------------------------------------------------------------
# Training targets + loss (CenterNet: penalty-reduced focal + L1)
# ---------------------------------------------------------------------------

def splat_targets(boxes_xyxy: np.ndarray, cfg: DetectorConfig
                  ) -> Dict[str, np.ndarray]:
    """Gaussian-splatted heatmap + size/offset targets for ONE image.

    boxes in input pixels; returns heat (h,w), wh (h,w,2), off (h,w,2),
    mask (h,w).
    """
    h = w = cfg.out_hw
    heat = np.zeros((h, w), np.float32)
    wh = np.zeros((h, w, 2), np.float32)
    off = np.zeros((h, w, 2), np.float32)
    mask = np.zeros((h, w), np.float32)
    for x1, y1, x2, y2 in np.asarray(boxes_xyxy, np.float32):
        bw, bh = (x2 - x1) / cfg.stride, (y2 - y1) / cfg.stride
        if bw <= 0 or bh <= 0:
            continue
        cx, cy = (x1 + x2) / 2 / cfg.stride, (y1 + y2) / 2 / cfg.stride
        ci, cj = int(np.clip(cy, 0, h - 1)), int(np.clip(cx, 0, w - 1))
        radius = max(1.0, 0.2 * min(bw, bh))
        ys, xs = np.ogrid[:h, :w]
        g = np.exp(-((xs - cj) ** 2 + (ys - ci) ** 2) / (2 * radius ** 2))
        heat = np.maximum(heat, g.astype(np.float32))
        wh[ci, cj] = np.log((bw, bh)) if cfg.wh_log else (bw, bh)
        off[ci, cj] = (cx - cj, cy - ci)
        mask[ci, cj] = 1.0
    return {"heat": heat, "wh": wh, "off": off, "mask": mask}


def detector_loss(out: Dict[str, jax.Array], tgt: Dict[str, jax.Array],
                  wh_weight: float = 0.1
                  ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """CenterNet loss.  wh_weight 0.1 suits pixel-space wh (errors O(10));
    use ~1.0 with cfg.wh_log targets (errors O(1))."""
    pred = jnp.clip(jax.nn.sigmoid(out["heat"][..., 0]), 1e-4, 1 - 1e-4)
    gt = tgt["heat"]
    pos = (gt >= 0.999).astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    focal_pos = -pos * ((1 - pred) ** 2) * jnp.log(pred)
    focal_neg = -(1 - pos) * ((1 - gt) ** 4) * (pred ** 2) * jnp.log(1 - pred)
    l_heat = (jnp.sum(focal_pos) + jnp.sum(focal_neg)) / n_pos
    m = tgt["mask"][..., None]
    l_wh = jnp.sum(jnp.abs(out["wh"] - tgt["wh"]) * m) / n_pos
    l_off = jnp.sum(jnp.abs(out["off"] - tgt["off"]) * m) / n_pos
    total = l_heat + wh_weight * l_wh + l_off
    return total, {"heat": l_heat, "wh": l_wh, "off": l_off, "total": total}
