"""TokenHMR training losses, including TALS (Threshold-Adaptive Loss
Scaling) "loose supervision".

Re-expresses ref `tokenhmr/lib/models/losses.py` functionally.  The
hard-coded per-keypoint 2D-error thresholds and per-joint angle thresholds
(ref `losses.py:7-20`) are framework data, reproduced verbatim — they ARE
the TALS method.  All masking is pure (the reference mutates gt tensors
in place, `tokenhmr.py:227-231`).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotations import joint_angle_error

# ref losses.py:7-14 — per-keypoint squared-2D-error validity thresholds (44 kp)
KP2D_ERR_VALID_THRESH = np.array(
    [0.0085024, 0.00648666, 0.00747825, 0.01103439, 0.01355629, 0.00741691,
     0.01096735, 0.01414461, 0.00974212, 0.01127469, 0.01663222, 0.00564927,
     0.01126335, 0.01615757, 0.00532595, 0.00829731, 0.00831497, 0.00737241,
     0.00743286, 0.00543739, 0.00550524, 0.00535504, 0.00565414, 0.00581685,
     0.00573041, 0.00554029, 0.01515258, 0.00986267, 0.00997563, 0.01519944,
     0.00511402, 0.01288267, 0.01105894, 0.00710525, 0.00709785, 0.01092387,
     0.01388091, 0.00648326, 0.00766487, 0.00931454, 0.00646622, 0.00677057,
     0.00744011, 0.00752381],
    dtype=np.float32,
)

# ref losses.py:15-20 — per-joint geodesic-angle validity thresholds
ANGLE_VALID_THRESH_BODY = 0.8 * np.array(
    [0.273709, 0.26481161, 0.1838198, 0.41490657, 0.37521194,
     0.20793171, 0.24905021, 0.33887333, 0.14481062, 0.35632194, 0.34944217,
     0.30542146, 0.32835298, 0.33110567, 0.34813467, 0.36357761, 0.40062272,
     0.43493496, 0.4400709, 0.78017052, 0.7375746, 0.24927082, 0.24966981],
    dtype=np.float32,
)
ANGLE_VALID_THRESH_GLOBAL = np.array([0.46], dtype=np.float32)

PELVIS_ID = 25 + 14  # ref tokenhmr.py:238 (39 in the 44-joint set)


def _elementwise(loss_type: str, pred, gt):
    if loss_type == "l1":
        return jnp.abs(pred - gt)
    if loss_type == "l2":
        return (pred - gt) ** 2
    raise ValueError(loss_type)


# ---------------------------------------------------------------------------
# Plain (non-TALS) losses — ref losses.py:36-99, 175-199
# ---------------------------------------------------------------------------

def keypoint_2d_loss(pred_kp2d, gt_kp2d_conf, loss_type: str = "l1"):
    """pred (B,N,2), gt (B,N,3) with confidence last.  Sum over batch."""
    conf = gt_kp2d_conf[..., -1:]
    return jnp.sum(conf * _elementwise(loss_type, pred_kp2d, gt_kp2d_conf[..., :-1]))


def keypoint_3d_loss(pred_kp3d, gt_kp3d_conf, pelvis_id: int = PELVIS_ID,
                     loss_type: str = "l1"):
    """Pelvis-centered conf-weighted loss (ref losses.py:67-99)."""
    pred = pred_kp3d - pred_kp3d[:, pelvis_id : pelvis_id + 1]
    gt = gt_kp3d_conf[..., :-1] - gt_kp3d_conf[:, pelvis_id : pelvis_id + 1, :-1]
    conf = gt_kp3d_conf[..., -1:]
    return jnp.sum(conf * _elementwise(loss_type, pred, gt))


def parameter_loss(pred, gt, has_param):
    """MSE masked per-sample (ref losses.py:175-199)."""
    B = pred.shape[0]
    mask = has_param.reshape((B,) + (1,) * (pred.ndim - 1)).astype(pred.dtype)
    return jnp.sum(mask * (pred - gt) ** 2)


def vertices_loss(pred_vertices, gt_vertices, loss_type: str = "l1"):
    return jnp.mean(_elementwise(loss_type, pred_vertices, gt_vertices))


def token_loss(cls_logits_softmax, gt_tokens, sample_weights=None,
               objective="logp"):
    """CE over token classes.
    pred (B, T, K) simplex, gt (B, T) int, sample_weights optional (B,)
    (masks samples whose gt pose — and hence gt tokens — is absent).

    objective="parity": the reference applies CrossEntropyLoss to
    ALREADY-SOFTMAXED outputs (ref losses.py:230-252) — log_softmax of a
    simplex.  That double softmax is (untested) dead code in the
    reference (TokenLoss is instantiated, never called in compute_loss)
    and its gradient is vanishingly small: simplex entries live in
    [0, 1], so the second softmax is near-uniform — a PERFECT classifier
    only reaches CE ~= ln(K) - 1, and at init the signal is ~1e-3 of a
    standard CE (measured flat at ln(2048) for 3k steps, round 4).

    objective="logp" (default for training): standard cross-entropy.
    Since the simplex IS softmax(logits), -log(p_gt) == the usual
    CrossEntropyLoss on the original logits (log o softmax = log_softmax
    composed once), i.e. what the PCT recipe the reference follows
    actually optimizes."""
    B, T, K = cls_logits_softmax.shape
    if objective == "parity":
        logp = jax.nn.log_softmax(cls_logits_softmax, axis=-1)
    else:
        logp = jnp.log(jnp.maximum(cls_logits_softmax, 1e-9))
    picked = jnp.take_along_axis(logp, gt_tokens[..., None], axis=-1)[..., 0]
    per_sample = -jnp.mean(picked, axis=-1)              # (B,)
    if sample_weights is None:
        return jnp.mean(per_sample)
    denom = jnp.maximum(jnp.sum(sample_weights), 1.0)
    return jnp.sum(per_sample * sample_weights) / denom


# ---------------------------------------------------------------------------
# TALS losses — ref losses.py:101-228 + tokenhmr.py:214-249
# ---------------------------------------------------------------------------

def tals_keypoint_masks(
    pred_kp2d, gt_kp2d_conf, kp_thresh: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """(valid_mask2D, weak_mask): keypoints whose squared 2D error exceeds
    the per-keypoint threshold get FULL supervision; the rest get weak.

    Ref `tokenhmr.py:218-223`.
    """
    if kp_thresh is None:
        kp_thresh = jnp.asarray(KP2D_ERR_VALID_THRESH)
    conf = gt_kp2d_conf[..., -1]
    err = conf * jnp.sum((pred_kp2d - gt_kp2d_conf[..., :-1]) ** 2, axis=-1)
    valid = err > kp_thresh[None, :]
    weak = conf * (~valid).astype(conf.dtype)
    return valid, weak


def keypoint_2d_loss_tals(pred_kp2d, gt_kp2d_conf, weak_mask, loose_weight: float,
                          loss_type: str = "l1"):
    """Full loss on valid keypoints + loose_weight * loss on weak ones.
    Caller pre-multiplies gt confidence by the valid mask (ref tokenhmr.py:227).
    """
    el = _elementwise(loss_type, pred_kp2d, gt_kp2d_conf[..., :-1])
    conf = gt_kp2d_conf[..., -1:]
    loss = jnp.sum(conf * el)
    loss += loose_weight * jnp.sum(weak_mask[..., None] * el)
    return loss


def tals_angle_masks(pred_rotmats, gt_rotmats, has_gt, always_valid,
                     thresh: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(valid_mask (B,J), weak_mask (B,J)) from per-joint geodesic error vs
    thresholds.  Ref `tokenhmr.py:247-255`.
    """
    angle_err = joint_angle_error(pred_rotmats, gt_rotmats)        # (B, J)
    valid = angle_err > thresh[None, :]
    valid = (valid.astype(jnp.float32) * has_gt[:, None]
             + always_valid[:, None]) > 0.5
    weak = (~valid).astype(jnp.float32) * has_gt[:, None]
    return valid.astype(jnp.float32), weak


def parameter_loss_tals(pred, gt, valid_mask, weak_mask, loose_weight: float):
    """Rotmat parameter loss with per-joint valid/weak masks
    (ref losses.py:201-228).  pred/gt: (B, J, 3, 3)."""
    per_joint = jnp.sum((pred - gt) ** 2, axis=(-1, -2))           # (B, J)
    loss = jnp.sum(valid_mask * per_joint)
    loss += loose_weight * jnp.sum(weak_mask * per_joint)
    return loss


# ---------------------------------------------------------------------------
# Full TokenHMR loss (ref tokenhmr.py:190-277)
# ---------------------------------------------------------------------------

def compute_tokenhmr_loss(
    output: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    loss_weights: Dict[str, float],
    loose_sup: bool = True,
    loose_weight: float = 0.05,
    train: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """batch contract (mirrors the reference dataloader output):
      keypoints_2d (B,44,3), keypoints_3d (B,44,4),
      smpl_params: {global_orient (B,1,3,3)|(B,3) aa, body_pose, betas (B,10)},
      has_smpl_params: {global_orient,body_pose,betas} (B,),
      valid_3d (B,) — 1.0 where the sample comes from a dataset with
      trustworthy 3D (H36M/BEDLAM flag, ref tokenhmr.py:233).
    """
    pred_kp2d = output["pred_keypoints_2d"]
    pred_kp3d = output["pred_keypoints_3d"]
    pred_smpl = output["pred_smpl_params"]
    gt_kp2d = batch["keypoints_2d"]
    gt_kp3d = batch["keypoints_3d"]
    gt_smpl = batch["smpl_params"]
    has = batch["has_smpl_params"]
    valid_3d = batch.get(
        "valid_3d", jnp.ones(pred_kp2d.shape[0], jnp.float32)
    )

    losses: Dict[str, jax.Array] = {}
    if loose_sup and train:
        valid2d, weak2d = tals_keypoint_masks(pred_kp2d, gt_kp2d)
        gt_kp2d_masked = gt_kp2d.at[..., -1].multiply(valid2d.astype(gt_kp2d.dtype))
        loss_kp2d = keypoint_2d_loss_tals(pred_kp2d, gt_kp2d_masked, weak2d, loose_weight)

        # 3D kp conf gated by dataset validity OR 2D-masked conf (ref :232-234)
        gate = ((valid_3d[:, None] + gt_kp2d_masked[..., -1]) > 0.5).astype(gt_kp3d.dtype)
        gt_kp3d_masked = gt_kp3d.at[..., -1].multiply(gate)
        loss_kp3d = keypoint_3d_loss(pred_kp3d, gt_kp3d_masked)

        go_valid, go_weak = tals_angle_masks(
            pred_smpl["global_orient"], gt_smpl["global_orient"],
            has["global_orient"], valid_3d, jnp.asarray(ANGLE_VALID_THRESH_GLOBAL),
        )
        bp_valid, bp_weak = tals_angle_masks(
            pred_smpl["body_pose"], gt_smpl["body_pose"],
            has["body_pose"], valid_3d, jnp.asarray(ANGLE_VALID_THRESH_BODY),
        )
        losses["global_orient"] = parameter_loss_tals(
            pred_smpl["global_orient"], gt_smpl["global_orient"],
            go_valid, go_weak, loose_weight,
        )
        losses["body_pose"] = parameter_loss_tals(
            pred_smpl["body_pose"], gt_smpl["body_pose"],
            bp_valid, bp_weak, loose_weight,
        )
        losses["betas"] = parameter_loss(
            pred_smpl["betas"], gt_smpl["betas"], has["betas"] * valid_3d
        )
    else:
        loss_kp2d = keypoint_2d_loss(pred_kp2d, gt_kp2d)
        loss_kp3d = keypoint_3d_loss(pred_kp3d, gt_kp3d)
        B = pred_kp2d.shape[0]
        for k in ("global_orient", "body_pose", "betas"):
            losses[k] = parameter_loss(
                pred_smpl[k].reshape(B, -1), gt_smpl[k].reshape(B, -1), has[k]
            )

    total = (
        loss_weights.get("KEYPOINTS_3D", 0.05) * loss_kp3d
        + loss_weights.get("KEYPOINTS_2D", 0.01) * loss_kp2d
        + loss_weights.get("GLOBAL_ORIENT", 0.001) * losses["global_orient"]
        + loss_weights.get("BODY_POSE", 0.001) * losses["body_pose"]
        + loss_weights.get("BETAS", 0.0005) * losses["betas"]
    )
    losses["keypoints_2d"] = loss_kp2d
    losses["keypoints_3d"] = loss_kp3d
    losses["total"] = total
    return total, losses
