"""On-device multi-person SMPL scenes for detector training.

Renders P procedural-humanoid SMPL bodies (models/humanoid.py) into ONE
full frame with a SHARED soft z-buffer (data/synth_crops.py:splat_render
over the concatenated vertex set — inter-person occlusion falls out of the
segment_min reduction), and derives ground-truth person boxes from the
projected vertices in-graph.  This upgrades `cli/train_detector.py`'s
training distribution from capsule stick figures (data/synth_people.py)
toward human-silhouette realism — the detector replaces the reference's
detectron2 ViTDet (ref `tokenhmr/demo.py:40-49`), and its only real-photo
evidence is scripts/real_photo_eval.py on the reference demo photographs.

Everything is jnp with static shapes: scenes always carry max_people
bodies; inactive ones are shifted out of the frustum and masked out of the
`valid` vector, so the whole generator jits once and runs on the
accelerator (the one-core host otherwise bounds composite generation at
~60/s).  Output is (body, alpha, boxes, valid); the caller composites onto
a background of its choice — the detector CLI reuses the domain-randomized
host background/photometric families from data/synth_people.py.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.smpl import SMPLModel, smpl_openpose_forward
from .synth_crops import sample_pose, shade_vertex_colors, splat_render


def render_scene_people(
    model: SMPLModel,
    part_id,                    # (V,) driving joint per vertex
    rng: jax.Array,
    batch: int,
    size: int = 256,
    max_people: int = 3,
    focal: float = 500.0,
    min_frac: float = 0.15,     # person pixel extent as fraction of frame
    max_frac: float = 1.15,
    full_rot_frac: float = 0.35,
    splat_beta: float = 60.0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """-> (body (B,S,S,3) [0,1], alpha (B,S,S,1), boxes (B,P,4) xyxy,
    valid (B,P) float).  Boxes are clipped to the frame; a person is
    valid if active this scene and its clipped box exceeds 8px a side."""
    B, P, S = batch, max_people, size
    r_pose, r_n, r_scale, r_place, r_shade = jax.random.split(rng, 5)

    p = sample_pose(r_pose, B * P, full_rot_frac=full_rot_frac)
    out = smpl_openpose_forward(
        model, p["betas"], p["global_orient"], p["body_pose"])
    verts = out["vertices"]                                   # (B*P, V, 3)
    V = verts.shape[1]
    verts = verts - verts.mean(axis=1, keepdims=True)         # center

    # depth from desired pixel extent: size_px ~ f * extent_m / tz
    extent = jnp.maximum(
        verts[..., 0].max(-1) - verts[..., 0].min(-1),
        verts[..., 1].max(-1) - verts[..., 1].min(-1))        # (B*P,)
    target_px = jax.random.uniform(
        r_scale, (B * P,), minval=min_frac * S, maxval=max_frac * S)
    tz = focal * extent / target_px
    # placement: person centroid projected anywhere in the middle 90%
    cuv = jax.random.uniform(r_place, (B * P, 2),
                             minval=0.05 * S, maxval=0.95 * S)
    txy = (cuv - S / 2) * tz[:, None] / focal
    cam_t = jnp.concatenate([txy, tz[:, None]], -1)           # (B*P, 3)

    # active people per scene: n ~ U{1..P}; inactive -> behind the camera
    # (z<0 fails the splat inside-mask AND the box visibility mask)
    n_active = jax.random.randint(r_n, (B,), 1, P + 1)
    active = (jnp.arange(P)[None] < n_active[:, None]).reshape(B * P)
    cam_t = cam_t.at[:, 2].set(jnp.where(active, cam_t[:, 2], -100.0))

    vcam = verts + cam_t[:, None, :]
    z = vcam[..., 2]
    u = focal * vcam[..., 0] / jnp.where(z == 0, 1e-6, z) + S / 2
    v = focal * vcam[..., 1] / jnp.where(z == 0, 1e-6, z) + S / 2

    # GT boxes from projected vertices (before clipping), then clip
    vis = z > 0.05
    big = jnp.float32(4 * S)
    u_lo = jnp.where(vis, u, big).min(-1)
    v_lo = jnp.where(vis, v, big).min(-1)
    u_hi = jnp.where(vis, u, -big).max(-1)
    v_hi = jnp.where(vis, v, -big).max(-1)
    boxes = jnp.stack([u_lo, v_lo, u_hi, v_hi], -1)           # (B*P, 4)
    boxes = jnp.clip(boxes, 0.0, S - 1.0)
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    valid = (active & (w > 8) & (h > 8)).astype(jnp.float32)

    color = shade_vertex_colors(model, part_id, verts, r_shade)
    body, alpha = splat_render(
        u.reshape(B, P * V), v.reshape(B, P * V), z.reshape(B, P * V),
        color.reshape(B, P * V, 3), S, S, splat_beta)
    return body, alpha, boxes.reshape(B, P, 4), valid.reshape(B, P)


def make_scene_batch_fn(model: SMPLModel, size: int = 256,
                        max_people: int = 3, **kw):
    """Returns jittable `fn(rng, batch) -> (body, alpha, boxes, valid)`."""
    part = jnp.asarray(np.argmax(np.asarray(model.lbs_weights), axis=1))

    def fn(rng: jax.Array, batch: int):
        return render_scene_people(model, part, rng, batch, size,
                                   max_people, **kw)

    return fn
