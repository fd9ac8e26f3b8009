"""Test-time pose analysis tools: SMPLify-Inv + VPoser decoder.

Capabilities of ref `tokenhmr/lib/utils/smplify_invert.py` (adversarial-pose
analysis: Adam-optimize pose/cam to FIT the 2D keypoints while PUSHING AWAY
from the 3D keypoints — loss `4*fit2D - push3D/2 + margin`, ref :124) and
`tokenhmr/lib/utils/vposer_utils.py` (VPoser V02_05 latent-to-pose decoder).

JAX-native: the optimization loop is a jitted lax.fori_loop over optax adam
(the reference runs an eager per-step torch loop).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..models.smpl import SMPLModel, smpl_openpose_forward
from ..ops.projection import perspective_projection
from ..ops.rotations import rotation_6d_to_matrix


def camera_fitting_loss(
    model_joints: jax.Array,      # (B, 44, 3)
    cam_t: jax.Array,             # (B, 3)
    focal_length: jax.Array,      # (B, 2)
    joints_2d_conf: jax.Array,    # (B, 44, 3) with confidence
    image_size: float = 256.0,
) -> jax.Array:
    """Confidence-weighted 2D reprojection loss (ref smplify_invert.py)."""
    proj = perspective_projection(model_joints, cam_t, focal_length / image_size)
    conf = joints_2d_conf[..., -1:]
    return jnp.mean(jnp.sum(conf * (proj - joints_2d_conf[..., :2]) ** 2, axis=(1, 2)))


@dataclasses.dataclass(frozen=True)
class SMPLifyInvConfig:
    num_iters: int = 100
    step_size: float = 1e-2
    margin: float = 50.0
    fit2d_weight: float = 4.0
    push3d_weight: float = 0.5
    focal_length: float = 5000.0
    image_size: float = 256.0


def smplify_invert(
    smpl_model: SMPLModel,
    init_pose_6d: jax.Array,      # (B, 24, 6)
    init_betas: jax.Array,        # (B, 10)
    init_cam_t: jax.Array,        # (B, 3)
    joints_2d_conf: jax.Array,    # (B, 44, 3)
    gt_keypoints_3d: jax.Array,   # (B, 44, 3)
    cfg: SMPLifyInvConfig = SMPLifyInvConfig(),
) -> Dict[str, jax.Array]:
    """Optimize (pose, cam_t) to fit 2D while pushing from 3D.

    Returns the optimized params + final vertices/joints/projections; betas
    stay frozen (ref :108-111).
    """
    B = init_pose_6d.shape[0]
    focal = jnp.full((B, 2), cfg.focal_length)
    opt = optax.adam(cfg.step_size, b1=0.9, b2=0.999)

    def forward(pose_6d, cam_t):
        rotmats = rotation_6d_to_matrix(pose_6d)
        out = smpl_openpose_forward(
            smpl_model, init_betas, rotmats[:, :1], rotmats[:, 1:]
        )
        return out

    def loss_fn(params):
        out = forward(params["pose"], params["cam_t"])
        fit2d = camera_fitting_loss(
            out["joints"], params["cam_t"], focal, joints_2d_conf, cfg.image_size
        )
        push3d = jnp.mean(jnp.sum(
            jnp.sqrt(jnp.sum((out["joints"] - gt_keypoints_3d) ** 2, -1) + 1e-9),
            axis=1,
        ))
        return cfg.fit2d_weight * fit2d - cfg.push3d_weight * push3d + cfg.margin

    params0 = {"pose": init_pose_6d, "cam_t": init_cam_t}
    opt_state0 = opt.init(params0)

    def body(_, carry):
        params, opt_state = carry
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    params, _ = jax.lax.fori_loop(0, cfg.num_iters, body, (params0, opt_state0))

    out = forward(params["pose"], params["cam_t"])
    proj = perspective_projection(
        out["joints"], params["cam_t"], focal / cfg.image_size
    )
    return {
        "pose_6d": params["pose"],
        "cam_t": params["cam_t"],
        "betas": init_betas,
        "vertices": out["vertices"],
        "joints": out["joints"],
        "keypoints_2d": proj,
        "final_loss": loss_fn(params),
    }


# ---------------------------------------------------------------------------
# VPoser decoder (ref vposer_utils.py:46-78)
# ---------------------------------------------------------------------------

class VPoserDecoder(nn.Module):
    """latent (B, 32) -> body pose 6D (B, 21*6); VPoser V02_05 architecture:
    Linear(32,512) LeakyReLU Dropout Linear(512,512) LeakyReLU
    Linear(512,126) -> 6D-GramSchmidt.  Note VPoser's 6D convention is
    COLUMN-stacked (ContinousRotReprDecoder, ref :31-44 == 'hmr2' here)."""

    num_neurons: int = 512
    latent_dim: int = 32
    num_joints: int = 21

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        h = nn.Dense(self.num_neurons, name="fc1")(z)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        h = nn.Dense(self.num_neurons, name="fc2")(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Dense(self.num_joints * 6, name="out")(h)
        rotmats = rotation_6d_to_matrix(
            h.reshape(-1, self.num_joints, 6), convention="hmr2"
        )
        from ..ops.rotations import matrix_to_rotation_6d

        six = matrix_to_rotation_6d(rotmats)   # tokenhmr row convention
        return six.reshape(z.shape[0], -1)


def sample_vposer(
    params, mu: jax.Array, logvar: jax.Array, rng: jax.Array
) -> jax.Array:
    """Reparameterized sample -> decoded pose 6D (ref :68-77)."""
    std = jax.nn.softplus(logvar)
    z = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
    return VPoserDecoder().apply(params, z)


def convert_vposer_checkpoint(ckpt_path: str):
    """VPoser V02_05 torch ckpt -> flax params for VPoserDecoder."""
    import numpy as np
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k.replace("vp_model.", ""): v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    t = lambda k: np.asarray(sd[k], np.float32).T
    b = lambda k: np.asarray(sd[k], np.float32)
    return {"params": {
        "fc1": {"kernel": t("decoder_net.0.weight"), "bias": b("decoder_net.0.bias")},
        "fc2": {"kernel": t("decoder_net.3.weight"), "bias": b("decoder_net.3.bias")},
        "out": {"kernel": t("decoder_net.5.weight"), "bias": b("decoder_net.5.bias")},
    }}
