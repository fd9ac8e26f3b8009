"""On-device synthetic training crops: pose prior -> SMPL -> splat render.

Generates fully-labelled (image, pose, betas, cam, kp2d, kp3d) person-crop
batches INSIDE jit on the accelerator — the data path that lets a v5e chip
train flat-out without the (one-core) host in the loop.  The reference has
no analogue (it streams BEDLAM/COCO tars); this exists because the real
datasets are registration-gated and absent, and because trained-weight
accuracy evidence for the int8/ToMe operating points (docs/PERF_NOTES.md)
needs a model trained on *some* real image->pose mapping.

Pipeline (all jnp, static shapes):
  1. pose prior: per-joint bounded axis-angle sampling with physiological
     ranges (plus yaw-dominated global orient and weak-persp cam framing)
  2. SMPL forward on the procedural humanoid (models/humanoid.py)
  3. soft z-buffer splat renderer: every vertex is splatted into a 3x3
     pixel neighbourhood with exp(-beta*(z - zmin)) depth weights —
     z-buffering as two segment reductions (segment_min + segment_sum),
     no serialized scatter, MXU/VPU-friendly
  4. lambertian shading from area-weighted vertex normals, per-part albedo
     (skin head/hands, clothing torso/legs), procedural background

Labels match the train-step batch contract (train/train_step.py):
kp2d/kp3d in the reference's [-0.5, 0.5] crop-normalized units.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.humanoid import SMPL_JOINT_NAMES
from ..models.smpl import SMPLModel, smpl_openpose_forward
from ..ops.rotations import axis_angle_to_matrix
from ..utils.texture import vertex_normals

# per-joint axis-angle ranges (radians) for the 23 SMPL body joints:
# (x=flexion, y=twist, z=abduction) — rough physiological bounds
_RANGES = {
    "l_hip": (0.8, 0.3, 0.4), "r_hip": (0.8, 0.3, 0.4),
    "spine1": (0.25, 0.20, 0.15), "spine2": (0.20, 0.20, 0.12),
    "spine3": (0.15, 0.20, 0.10),
    "l_knee": (1.1, 0.10, 0.05), "r_knee": (1.1, 0.10, 0.05),
    "l_ankle": (0.40, 0.15, 0.15), "r_ankle": (0.40, 0.15, 0.15),
    "l_foot": (0.20, 0.05, 0.05), "r_foot": (0.20, 0.05, 0.05),
    "neck": (0.35, 0.40, 0.20), "head": (0.30, 0.40, 0.20),
    "l_collar": (0.12, 0.12, 0.12), "r_collar": (0.12, 0.12, 0.12),
    "l_shoulder": (0.9, 0.6, 0.7), "r_shoulder": (0.9, 0.6, 0.7),
    "l_elbow": (0.1, 0.4, 1.2), "r_elbow": (0.1, 0.4, 1.2),
    "l_wrist": (0.4, 0.3, 0.3), "r_wrist": (0.4, 0.3, 0.3),
    "l_hand": (0.15, 0.10, 0.10), "r_hand": (0.15, 0.10, 0.10),
}
POSE_SCALE = np.asarray(
    [_RANGES[n] for n in SMPL_JOINT_NAMES[1:]], np.float32)  # (23, 3)

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class SynthConfig:
    height: int = 256
    width: int = 192
    image_size: float = 256.0      # reference camera convention (square)
    focal_length: float = 5000.0   # EXTRA.FOCAL_LENGTH
    splat_beta: float = 60.0       # soft z-buffer sharpness (1/m)
    normalize: bool = True         # emit (x - mean)/std images


def sample_pose(rng: jax.Array, batch: int,
                full_rot_frac: float = 0.1) -> Dict[str, jax.Array]:
    """Sample body_pose/global_orient (rotmats), betas, weak-persp cam.

    full_rot_frac: share of samples with an arbitrary 3D global rotation
    (lying / inverted people); the rest are upright yaw-dominated.
    """
    r_pose, r_mag, r_go, r_betas, r_cam = jax.random.split(rng, 5)
    # bounded heavy-tailed per-joint angles: tanh keeps them inside the
    # physiological box, the magnitude mixture adds near-rest poses
    raw = jax.random.normal(r_pose, (batch, 23, 3))
    mag = jax.random.uniform(r_mag, (batch, 1, 1), minval=0.35, maxval=1.0)
    aa = jnp.tanh(raw * 0.7) * POSE_SCALE * mag
    body_pose = axis_angle_to_matrix(aa)                       # (B, 23, 3, 3)

    ry, rp, rr, rfull, rmix = jax.random.split(r_go, 5)
    yaw = jax.random.uniform(ry, (batch,), minval=-np.pi, maxval=np.pi)
    pitch = 0.25 * jax.random.normal(rp, (batch,))
    roll = 0.15 * jax.random.normal(rr, (batch,))
    zeros = jnp.zeros_like(yaw)
    go = (axis_angle_to_matrix(jnp.stack([zeros, yaw, zeros], -1)[:, None])[:, 0]
          @ axis_angle_to_matrix(jnp.stack([pitch, zeros, zeros], -1)[:, None])[:, 0]
          @ axis_angle_to_matrix(jnp.stack([zeros, zeros, roll], -1)[:, None])[:, 0])
    # 10%: arbitrary global rotation (lying / upside-down crops)
    rand_aa = jax.random.normal(rfull, (batch, 1, 3))
    rand_aa = rand_aa / (jnp.linalg.norm(rand_aa, axis=-1, keepdims=True) + 1e-6)
    rand_ang = jax.random.uniform(rfull, (batch, 1, 1), maxval=np.pi)
    go_full = axis_angle_to_matrix(rand_aa * rand_ang)[:, 0]
    pick = jax.random.uniform(rmix, (batch, 1, 1)) < full_rot_frac
    go = jnp.where(pick, go_full, go)
    # model frame is y-up; the image/camera convention (OpenCV: y down,
    # z forward) flips y and z — fold the flip into global_orient so GT
    # pose labels live in the exact frame the network must predict
    flip = jnp.diag(jnp.asarray([1.0, -1.0, -1.0]))
    global_orient = (flip @ go)[:, None]                        # (B, 1, 3, 3)

    betas = jnp.clip(jax.random.normal(r_betas, (batch, 10)) * 0.8, -2.5, 2.5)

    rs, rt = jax.random.split(r_cam)
    s = jax.random.uniform(rs, (batch,), minval=0.70, maxval=1.15)
    txy = 0.08 * jax.random.normal(rt, (batch, 2)) / s[:, None]
    cam = jnp.concatenate([s[:, None], txy], -1)                # (B, 3)
    return {"body_pose": body_pose, "global_orient": global_orient,
            "betas": betas, "cam": cam}


def _background(rng: jax.Array, batch: int, H: int, W: int) -> jax.Array:
    """Cheap procedural background: 2 directional colour gradients + noise."""
    r1, r2, r3 = jax.random.split(rng, 3)
    yy = jnp.linspace(-1, 1, H)[None, :, None, None]
    xx = jnp.linspace(-1, 1, W)[None, None, :, None]
    base = jax.random.uniform(r1, (batch, 1, 1, 3), minval=0.1, maxval=0.9)
    g = jax.random.normal(r2, (batch, 2, 3)) * 0.2
    img = base + g[:, None, None, 0] * yy + g[:, None, None, 1] * xx
    img = img + 0.04 * jax.random.normal(r3, (batch, H, W, 3))
    return jnp.clip(img, 0.0, 1.0)


_SKIN_PARTS = np.zeros(24, np.float32)
for _n in ("head", "neck", "l_wrist", "r_wrist", "l_hand", "r_hand",
           "l_elbow", "r_elbow"):
    _SKIN_PARTS[SMPL_JOINT_NAMES.index(_n)] = 1.0


def shade_vertex_colors(model: SMPLModel, part_id, verts: jax.Array,
                        rng: jax.Array) -> jax.Array:
    """Per-vertex lambertian colors: random light + per-part albedo.

    verts (B, V, 3) posed, model frame -> (B, V, 3) colors in [0, 1].
    """
    B = verts.shape[0]
    r_light, r_skin, r_cloth = jax.random.split(rng, 3)
    normals = vertex_normals(verts, model.faces)                # (B, V, 3)
    light = jax.random.normal(r_light, (B, 3))
    light = light.at[:, 2].set(-jnp.abs(light[:, 2]) - 1.0)
    light = light / jnp.linalg.norm(light, axis=-1, keepdims=True)
    lambert = jnp.clip(jnp.einsum("bvc,bc->bv", normals, light), 0.0, 1.0)
    shade = 0.35 + 0.65 * lambert                               # (B, V)

    skin = jax.random.uniform(r_skin, (B, 1, 3),
                              minval=jnp.asarray([0.45, 0.30, 0.22]),
                              maxval=jnp.asarray([0.95, 0.80, 0.70]))
    cloth_torso = jax.random.uniform(r_cloth, (B, 1, 3))
    cloth_legs = jax.random.uniform(jax.random.fold_in(r_cloth, 1), (B, 1, 3))
    is_skin = jnp.asarray(_SKIN_PARTS)[part_id][None, :, None]  # (1, V, 1)
    is_leg = (jnp.asarray(
        [1.0 if n in ("l_hip", "r_hip", "l_knee", "r_knee", "l_ankle",
                      "r_ankle", "l_foot", "r_foot")
         else 0.0 for n in SMPL_JOINT_NAMES], np.float32)[part_id]
        [None, :, None])
    albedo = (is_skin * skin + (1 - is_skin) *
              (is_leg * cloth_legs + (1 - is_leg) * cloth_torso))
    return albedo * shade[..., None]                            # (B, V, 3)


def splat_render(u: jax.Array, v: jax.Array, z: jax.Array, color: jax.Array,
                 H: int, W: int, beta: float = 60.0
                 ) -> Tuple[jax.Array, jax.Array]:
    """3x3 vertex splat with soft z-buffer via two segment reductions.

    u/v/z (B, N) pixel coords + cam depth, color (B, N, 3)
    -> (body (B, H, W, 3), alpha (B, H, W, 1)).  N may concatenate the
    vertices of several people — the shared segment_min z-buffer then
    resolves inter-person occlusion for free.
    """
    B = u.shape[0]
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    pix_list, w_list = [], []
    for dy, dx in offs:
        px = ui + dx
        py = vi + dy
        inside = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (z > 0.05)
        pcl = jnp.clip(px, 0, W - 1)
        pyl = jnp.clip(py, 0, H - 1)
        idx = pyl * W + pcl                                     # (B, N)
        pix_list.append(jnp.where(inside, idx, H * W))          # overflow bin
        # bilinear-ish footprint weight
        d2 = (u - (px + 0.5)) ** 2 + (v - (py + 0.5)) ** 2
        w_list.append(jnp.exp(-0.8 * d2))
    pix = jnp.stack(pix_list, 1).reshape(B, -1)                 # (B, 9N)
    foot = jnp.stack(w_list, 1).reshape(B, -1)
    zz = jnp.tile(z[:, None], (1, 9, 1)).reshape(B, -1)
    cc = jnp.tile(color[:, None], (1, 9, 1, 1)).reshape(B, -1, 3)

    NSEG = H * W + 1
    big = jnp.float32(1e9)
    zmin = jax.vmap(
        lambda zv, iv: jax.ops.segment_min(zv, iv, num_segments=NSEG)
    )(jnp.where(pix < H * W, zz, big), pix)
    zref = jnp.take_along_axis(zmin, pix, axis=1)
    wdepth = foot * jnp.exp(-beta * jnp.maximum(zz - zref, 0.0))
    wdepth = jnp.where(pix < H * W, wdepth, 0.0)
    csum = jax.vmap(
        lambda cv, iv: jax.ops.segment_sum(cv, iv, num_segments=NSEG)
    )(cc * wdepth[..., None], pix)
    wsum = jax.vmap(
        lambda wv, iv: jax.ops.segment_sum(wv, iv, num_segments=NSEG)
    )(wdepth, pix)

    body = csum[:, : H * W].reshape(B, H, W, 3)
    alpha = jnp.clip(wsum[:, : H * W].reshape(B, H, W, 1) / 0.8, 0.0, 1.0)
    body = body / jnp.maximum(wsum[:, : H * W, None].reshape(B, H, W, 1), 1e-6)
    return body, alpha


def render_crops(
    model: SMPLModel,
    part_id,                       # (V,) driving joint per vertex
    verts: jax.Array,              # (B, V, 3) posed, model frame
    cam_t: jax.Array,              # (B, 3)
    rng: jax.Array,
    cfg: SynthConfig = SynthConfig(),
) -> jax.Array:
    """Soft z-buffered vertex-splat render -> (B, H, W, 3) in [0, 1]."""
    B, V, _ = verts.shape
    H, W = cfg.height, cfg.width
    r_shade, r_bg = jax.random.split(rng)

    vcam = verts + cam_t[:, None, :]
    z = vcam[..., 2]
    f = cfg.focal_length
    # pixel coords in the (H, W) crop cut from the square image_size frame
    u = f * vcam[..., 0] / z + cfg.image_size / 2 - (cfg.image_size - W) / 2
    v = f * vcam[..., 1] / z + cfg.image_size / 2 - (cfg.image_size - H) / 2

    color = shade_vertex_colors(model, part_id, verts, r_shade)
    body, alpha = splat_render(u, v, z, color, H, W, cfg.splat_beta)
    bg = _background(r_bg, B, H, W)
    return body * alpha + bg * (1 - alpha)


def make_synth_batch_fn(model: SMPLModel,
                        cfg: SynthConfig = SynthConfig()):
    """Returns jittable `fn(rng, batch) -> train batch dict`.

    Works for ANY SMPLModel: the per-vertex body part used for albedo is
    the argmax skinning joint.
    """
    part = jnp.asarray(np.argmax(np.asarray(model.lbs_weights), axis=1))
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def fn(rng: jax.Array, batch: int) -> Dict[str, jax.Array]:
        r_pose, r_render = jax.random.split(rng)
        p = sample_pose(r_pose, batch)
        out = smpl_openpose_forward(
            model, p["betas"], p["global_orient"], p["body_pose"])
        focal = jnp.full((batch, 2), cfg.focal_length, jnp.float32)
        tz = 2.0 * cfg.focal_length / (cfg.image_size * p["cam"][:, 0] + 1e-9)
        cam_t = jnp.concatenate([p["cam"][:, 1:], tz[:, None]], -1)
        img = render_crops(model, part, out["vertices"], cam_t, r_render, cfg)
        if cfg.normalize:
            img = (img - mean) / std
        kp3d = out["joints"]                                    # (B, 44, 3)
        kp2d = ((kp3d + cam_t[:, None, :])[..., :2]
                / (kp3d + cam_t[:, None, :])[..., 2:3]
                * focal[:, None, :] / cfg.image_size)           # [-0.5, 0.5]
        B = batch
        ones = jnp.ones((B,), jnp.float32)
        return {
            "img": img,
            "keypoints_2d": jnp.concatenate(
                [kp2d, jnp.ones((B, kp3d.shape[1], 1))], -1),
            "keypoints_3d": jnp.concatenate(
                [kp3d, jnp.ones((B, kp3d.shape[1], 1))], -1),
            "smpl_params": {
                "global_orient": p["global_orient"],
                "body_pose": p["body_pose"],
                "betas": p["betas"],
            },
            "has_smpl_params": {"global_orient": ones, "body_pose": ones,
                                "betas": ones},
            "valid_3d": ones,
            "gt_cam_t": cam_t,
        }

    return fn
