"""PoseVQ tokenizer training: losses, train/eval steps, and the loop.

Capabilities of ref `tokenization/train_poseVQ.py` (manual warmup + AdamW +
MultiStepLR loop), `tokenization/utils/losses.py` (pose/mesh/joints recon
losses incl. area-weighted mesh L2 and geodesic pose loss) and
`tokenization/utils/eval_poseVQ.py` (recon metrics + best-ckpt selection) —
as pure jitted steps over explicit (params, opt_state, vq_state).

The reference's per-item SMPLH forward inside the dataset __getitem__
(`dataset_poseVQ.py:111-113`) is replaced by a batched on-device forward in
the loss itself — GT mesh/joints are recomputed from gt rotmats inside the
same jit, which on TPU is cheaper than shipping 6890x3 float arrays from
host per item.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.posevq import PoseVQConfig, VQState, posevq_forward_train
from ..models.smpl import SMPLModel, smplh_body_forward
from ..ops.rotations import rotation_6d_to_matrix, so3_rotation_angle


# ---------------------------------------------------------------------------
# Losses (ref tokenization/utils/losses.py)
# ---------------------------------------------------------------------------

def geodesic_loss(pred_rot: jax.Array, gt_rot: jax.Array) -> jax.Array:
    """Mean geodesic angle (ref Geodesic_Loss :5-28)."""
    m = pred_rot.reshape(-1, 3, 3) @ jnp.swapaxes(gt_rot.reshape(-1, 3, 3), -1, -2)
    return jnp.mean(so3_rotation_angle(m))


def compute_vertex_area_weights(model: SMPLModel) -> np.ndarray:
    """Per-vertex weights from normalized adjacent-triangle areas
    (ref calculate_vertex_weights :106-119)."""
    verts = np.asarray(model.v_template)
    faces = np.asarray(model.faces)
    v1, v2, v3 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    tri_area = 0.5 * np.linalg.norm(np.cross(v2 - v1, v3 - v1), axis=1)
    denom = max(tri_area.max() - tri_area.min(), 1e-12)
    norm_area = (tri_area - tri_area.min()) / denom
    w = np.zeros((verts.shape[0], 1))
    np.add.at(w, faces.reshape(-1), np.repeat(norm_area, 3)[:, None])
    return np.repeat(w, 3, axis=1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class TokenizerLossConfig:
    """Ref tokenizer_amass_moyo.yaml LOSS block."""

    pose_loss: str = "l2"        # l2 | l1 | geodesic
    mesh_loss: str = "wt_l2"     # wt_l2 | l2 | l1
    jnt_loss: str = "l2"
    pose_w: float = 20.0
    mesh_w: float = 100.0
    jnt_w: float = 100.0
    commit_w: float = 1.0
    loss_w: float = 1.0
    only_valid_jnt: bool = True  # joints 1..21


VALID_JOINTS = tuple(range(1, 22))


def _recon(loss_type, pred, gt, weights=None):
    if loss_type == "l1":
        return jnp.mean(jnp.abs(pred - gt))
    if loss_type == "wt_l2":
        assert weights is not None
        return jnp.mean(weights * (pred - gt) ** 2)
    return jnp.mean((pred - gt) ** 2)


def tokenizer_losses(
    pred_pose_6d: jax.Array,       # (B, 21, 6)
    gt_rotmat: jax.Array,          # (B, 21, 3, 3)
    smplh: SMPLModel,
    loss_cfg: TokenizerLossConfig,
    vertex_weights: Optional[jax.Array] = None,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Pose/mesh/joint recon losses; returns (losses, aux with pred meshes)."""
    pred_rotmat = rotation_6d_to_matrix(pred_pose_6d)
    pred_out = smplh_body_forward(smplh, pred_rotmat)
    gt_out = smplh_body_forward(smplh, gt_rotmat)

    if loss_cfg.pose_loss == "geodesic":
        loss_pose = geodesic_loss(pred_rotmat, gt_rotmat)
    else:
        loss_pose = _recon(loss_cfg.pose_loss, pred_rotmat, gt_rotmat)

    loss_mesh = _recon(loss_cfg.mesh_loss, pred_out["vertices"],
                       gt_out["vertices"], vertex_weights)

    vj = jnp.asarray(VALID_JOINTS)
    if loss_cfg.only_valid_jnt:
        loss_jnt = _recon(loss_cfg.jnt_loss, pred_out["joints"][:, vj],
                          gt_out["joints"][:, vj])
    else:
        loss_jnt = _recon(loss_cfg.jnt_loss, pred_out["joints"], gt_out["joints"])

    losses = {"pose": loss_pose, "mesh": loss_mesh, "joints": loss_jnt}
    aux = {"pred_vertices": pred_out["vertices"], "gt_vertices": gt_out["vertices"],
           "pred_joints": pred_out["joints"], "gt_joints": gt_out["joints"]}
    return losses, aux


# ---------------------------------------------------------------------------
# Optimizer / schedule (ref train_poseVQ.py:19-25, options OPT block)
# ---------------------------------------------------------------------------

def make_tokenizer_optimizer(
    lr: float = 2e-4,
    weight_decay: float = 1e-5,
    warmup_iters: int = 2,
    milestones: Tuple[int, ...] = (150_000,),
    gamma: float = 0.05,
) -> optax.GradientTransformation:
    """Linear warmup -> piecewise-constant decay AdamW (warmup ref :19-25,
    MultiStepLR ref :98)."""
    def schedule(step):
        warm = jnp.minimum((step + 1) / max(warmup_iters, 1), 1.0)
        decay = jnp.ones(())
        for m in milestones:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return lr * warm * decay

    return optax.adamw(schedule, weight_decay=weight_decay, b1=0.9, b2=0.99)


# ---------------------------------------------------------------------------
# Train / eval steps
# ---------------------------------------------------------------------------

class TokenizerTrainState(dict):
    pass


def make_tokenizer_train_step(
    cfg: PoseVQConfig,
    smplh: SMPLModel,
    optimizer: optax.GradientTransformation,
    loss_cfg: TokenizerLossConfig = TokenizerLossConfig(),
    vertex_weights: Optional[np.ndarray] = None,
) -> Callable:
    vw = jnp.asarray(vertex_weights) if vertex_weights is not None else None

    def step(params, opt_state, vq_state: VQState, gt_rotmat, rng):
        from ..ops.rotations import matrix_to_rotation_6d

        gt_6d = matrix_to_rotation_6d(gt_rotmat)

        def loss_fn(p):
            pred, commit, perp, new_vq = posevq_forward_train(
                p, cfg, vq_state, gt_6d, rng, training=True
            )
            losses, _ = tokenizer_losses(pred, gt_rotmat, smplh, loss_cfg, vw)
            total = loss_cfg.loss_w * (
                loss_cfg.pose_w * losses["pose"]
                + loss_cfg.mesh_w * losses["mesh"]
                + loss_cfg.jnt_w * losses["joints"]
                + loss_cfg.commit_w * commit
            )
            metrics = dict(losses)
            metrics.update(total=total, commit=commit, perplexity=perp)
            return total, (metrics, new_vq)

        (_, (metrics, new_vq)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, new_vq, metrics

    return step


def make_tokenizer_eval_step(cfg: PoseVQConfig, smplh: SMPLModel) -> Callable:
    """Per-batch recon errors in mm + perplexity (ref eval_poseVQ.py:47-115)."""

    def step(params, vq_state: VQState, gt_rotmat, rng):
        from ..ops.rotations import matrix_to_rotation_6d

        gt_6d = matrix_to_rotation_6d(gt_rotmat)
        pred, _, perp, _ = posevq_forward_train(
            params, cfg, vq_state, gt_6d, rng, training=False
        )
        pred_rotmat = rotation_6d_to_matrix(pred)
        pred_out = smplh_body_forward(smplh, pred_rotmat)
        gt_out = smplh_body_forward(smplh, gt_rotmat)
        vj = jnp.asarray(VALID_JOINTS)
        pose_err = jnp.linalg.norm(
            (pred_rotmat - gt_rotmat).reshape(gt_rotmat.shape[0], -1), axis=-1
        ).mean() * 1000.0
        mesh_err = jnp.sqrt(
            jnp.sum((pred_out["vertices"] - gt_out["vertices"]) ** 2, -1)
        ).mean() * 1000.0
        jnt_err = jnp.sqrt(
            jnp.sum((pred_out["joints"][:, vj] - gt_out["joints"][:, vj]) ** 2, -1)
        ).mean() * 1000.0
        return {"pose_err": pose_err, "mesh_err": mesh_err,
                "jnt_err": jnt_err, "perplexity": perp}

    return step
