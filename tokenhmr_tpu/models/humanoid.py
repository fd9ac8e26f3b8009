"""Procedural humanoid SMPL-compatible body model.

The reference's SMPL/SMPL-H artifacts are registration-gated and absent
from this environment; `synthetic_smpl_model` (models/smpl.py) is a
random-blob stand-in good enough for shape-level tests but meaningless to
*render*.  This module builds a real humanoid: capsule-limb surface
geometry on the true SMPL 24-joint kinematic tree with anthropometric
T-pose proportions (public-domain averages), distance-based LBS skinning,
gaussian joint regressors, and low-rank procedural shape blendshapes.

It is a drop-in `SMPLModel` (same fields, same 6890/24 default sizes), so
the whole stack — LBS, OpenPose remap, J19 extra regressor, rendering,
training — runs on human-shaped geometry.  It is NOT the SMPL mesh and
carries none of its registered data; when the real pkl artifacts are
available, `load_smpl_model` replaces this (convert/load.py).

Used for: synthetic-data training runs (cli/train.py --data synth), the
trained-weight accuracy evidence for the int8/ToMe operating points
(docs/PERF_NOTES.md), demo/test renders.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax.numpy as jnp

from .smpl import NUM_SMPL_JOINTS, SMPLModel

# SMPL kinematic tree (public): joint j's parent
SMPL_PARENTS = np.asarray(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 20, 21], np.int64)

SMPL_JOINT_NAMES = [
    "pelvis", "l_hip", "r_hip", "spine1", "l_knee", "r_knee", "spine2",
    "l_ankle", "r_ankle", "spine3", "l_foot", "r_foot", "neck", "l_collar",
    "r_collar", "head", "l_shoulder", "r_shoulder", "l_elbow", "r_elbow",
    "l_wrist", "r_wrist", "l_hand", "r_hand",
]

# T-pose joint centers, meters, y-up, pelvis at origin (~1.72 m figure,
# arms in T; anthropometric averages)
_TPOSE = np.asarray([
    [0.000,  0.000, 0.000],   # pelvis
    [0.090, -0.080, 0.000],   # l_hip
    [-0.090, -0.080, 0.000],  # r_hip
    [0.000,  0.115, 0.000],   # spine1
    [0.100, -0.490, 0.000],   # l_knee
    [-0.100, -0.490, 0.000],  # r_knee
    [0.000,  0.240, 0.000],   # spine2
    [0.105, -0.900, 0.000],   # l_ankle
    [-0.105, -0.900, 0.000],  # r_ankle
    [0.000,  0.340, 0.000],   # spine3
    [0.110, -0.960, 0.110],   # l_foot (toe)
    [-0.110, -0.960, 0.110],  # r_foot
    [0.000,  0.470, 0.000],   # neck
    [0.060,  0.420, 0.000],   # l_collar
    [-0.060,  0.420, 0.000],  # r_collar
    [0.000,  0.580, 0.000],   # head
    [0.175,  0.440, 0.000],   # l_shoulder
    [-0.175,  0.440, 0.000],  # r_shoulder
    [0.435,  0.440, 0.000],   # l_elbow
    [-0.435,  0.440, 0.000],  # r_elbow
    [0.680,  0.440, 0.000],   # l_wrist
    [-0.680,  0.440, 0.000],  # r_wrist
    [0.760,  0.440, 0.000],   # l_hand
    [-0.760,  0.440, 0.000],  # r_hand
], np.float32)

# capsule bones: (driving joint a, end joint b, radius at a, radius at b)
# vertices on bone (a -> b) are skinned to joint a (SMPL convention: the
# rotation AT a moves the segment below it), blending into b near the far
# end so joints bend smoothly
_BONES: List[Tuple[str, str, float, float]] = [
    ("pelvis", "spine1", 0.125, 0.115),
    ("spine1", "spine2", 0.115, 0.120),
    ("spine2", "spine3", 0.120, 0.125),
    ("spine3", "neck",   0.125, 0.055),
    ("neck",   "head",   0.050, 0.055),
    ("l_collar", "l_shoulder", 0.050, 0.048),
    ("r_collar", "r_shoulder", 0.050, 0.048),
    ("l_shoulder", "l_elbow", 0.047, 0.038),
    ("r_shoulder", "r_elbow", 0.047, 0.038),
    ("l_elbow", "l_wrist", 0.038, 0.030),
    ("r_elbow", "r_wrist", 0.038, 0.030),
    ("l_wrist", "l_hand", 0.030, 0.022),
    ("r_wrist", "r_hand", 0.030, 0.022),
    ("l_hip", "l_knee", 0.075, 0.055),
    ("r_hip", "r_knee", 0.075, 0.055),
    ("l_knee", "l_ankle", 0.055, 0.038),
    ("r_knee", "r_ankle", 0.055, 0.038),
    ("l_ankle", "l_foot", 0.038, 0.030),
    ("r_ankle", "r_foot", 0.038, 0.030),
]
_HEAD_RADIUS = (0.080, 0.105, 0.092)   # ellipsoid semi-axes (x, y, z)
_J = {n: i for i, n in enumerate(SMPL_JOINT_NAMES)}


def _orthonormal(axis: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    a = axis / (np.linalg.norm(axis) + 1e-9)
    ref = np.array([0.0, 0.0, 1.0]) if abs(a[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(a, ref)
    u /= np.linalg.norm(u) + 1e-9
    v = np.cross(a, u)
    return u.astype(np.float32), v.astype(np.float32)


def _capsule(a_pos, b_pos, ra, rb, n_rings, n_around):
    """Ring vertices + their along-bone parameter t in [0, 1]."""
    axis = b_pos - a_pos
    u, v = _orthonormal(axis)
    ts = np.linspace(0.0, 1.0, n_rings, dtype=np.float32)
    ang = np.linspace(0, 2 * np.pi, n_around, endpoint=False, dtype=np.float32)
    verts, tpar = [], []
    for t in ts:
        c = a_pos + t * axis
        r = (1 - t) * ra + t * rb
        ring = c + r * (np.cos(ang)[:, None] * u + np.sin(ang)[:, None] * v)
        verts.append(ring)
        tpar.append(np.full(n_around, t, np.float32))
    return np.concatenate(verts, 0), np.concatenate(tpar, 0)


def _ring_faces(offset, n_rings, n_around):
    f = []
    for r in range(n_rings - 1):
        for a in range(n_around):
            i0 = offset + r * n_around + a
            i1 = offset + r * n_around + (a + 1) % n_around
            i2 = i0 + n_around
            i3 = i1 + n_around
            f.append([i0, i1, i2])
            f.append([i1, i3, i2])
    return f


def build_humanoid(num_vertices: int = 6890, num_betas: int = 10,
                   seed: int = 0) -> Dict[str, np.ndarray]:
    """Geometry + skinning arrays for the procedural humanoid (numpy)."""
    rng = np.random.RandomState(seed)
    J = NUM_SMPL_JOINTS
    joints = _TPOSE.copy()

    # vertex budget proportional to capsule lateral area; head ellipsoid
    # gets a fixed share
    areas = []
    for a, b, ra, rb in _BONES:
        length = np.linalg.norm(joints[_J[b]] - joints[_J[a]])
        areas.append(length * (ra + rb) * np.pi)
    head_share = 0.10
    areas = np.asarray(areas)
    budget = int(num_vertices * (1 - head_share))

    verts, faces, skin_pairs = [], [], []
    count = 0
    for (a, b, ra, rb), area in zip(_BONES, areas):
        n = max(int(round(budget * area / areas.sum())), 24)
        # isotropic surface sampling: ring spacing ~ circumferential spacing
        # (otherwise thin limbs render as stripes of disconnected strands)
        length = float(np.linalg.norm(joints[_J[b]] - joints[_J[a]]))
        r_avg = 0.5 * (ra + rb)
        n_around = int(np.clip(
            round(np.sqrt(n * 2 * np.pi * r_avg / max(length, 1e-3))), 6, 28))
        n_rings = max(n // n_around, 3)
        va, tp = _capsule(joints[_J[a]], joints[_J[b]], ra, rb, n_rings, n_around)
        faces += _ring_faces(count, n_rings, n_around)
        verts.append(va)
        # skinning: driven by joint a, blending to b on the far half
        s = np.clip((tp - 0.55) / 0.9, 0.0, 0.5)
        skin_pairs.append(np.stack([
            np.full_like(tp, _J[a]), np.full_like(tp, _J[b]), 1 - s, s], 1))
        count += len(va)

    # head ellipsoid (driven by the head joint)
    n_head = num_vertices - count
    n_around = 18
    n_rings = max(n_head // n_around, 4)
    phi = np.linspace(0.12, np.pi - 0.12, n_rings, dtype=np.float32)
    ang = np.linspace(0, 2 * np.pi, n_around, endpoint=False, dtype=np.float32)
    hx, hy, hz = _HEAD_RADIUS
    centre = joints[_J["head"]] + np.array([0, 0.07, 0.01], np.float32)
    hv = np.stack(
        [hx * np.outer(np.sin(phi), np.cos(ang)),
         hy * np.outer(np.cos(phi), np.ones_like(ang)),
         hz * np.outer(np.sin(phi), np.sin(ang))], -1
    ).reshape(-1, 3) + centre
    faces += _ring_faces(count, n_rings, n_around)
    verts.append(hv.astype(np.float32))
    skin_pairs.append(np.stack([
        np.full(len(hv), _J["head"], np.float32),
        np.full(len(hv), _J["neck"], np.float32),
        np.full(len(hv), 1.0, np.float32), np.zeros(len(hv), np.float32)], 1))
    count += len(hv)

    # pad to the exact vertex count with duplicates of the last ring (keeps
    # V == num_vertices so checkpoints are shape-stable)
    if count < num_vertices:
        pad = num_vertices - count
        verts.append(np.repeat(hv[-1:], pad, 0))
        skin_pairs.append(np.repeat(skin_pairs[-1][-1:], pad, 0))
    v_template = np.concatenate(verts, 0)[:num_vertices].astype(np.float32)
    skin = np.concatenate(skin_pairs, 0)[:num_vertices]
    faces = np.asarray(faces, np.int64)
    faces = faces[(faces < num_vertices).all(1)]

    lbs_weights = np.zeros((num_vertices, J), np.float32)
    lbs_weights[np.arange(num_vertices), skin[:, 0].astype(int)] = skin[:, 2]
    lbs_weights[np.arange(num_vertices), skin[:, 1].astype(int)] += skin[:, 3]

    # joint regressor: gaussian over T-pose distance to the joint
    d = np.linalg.norm(v_template[None, :, :] - joints[:, None, :], axis=-1)
    J_regressor = np.exp(-(d / 0.05) ** 2)
    J_regressor += 1e-8  # every row normalizable even for far joints
    J_regressor /= J_regressor.sum(1, keepdims=True)
    J_regressor = J_regressor.astype(np.float32)

    # shape blendshapes: height, width, limb girth + small smooth modes
    radial = v_template.copy()
    radial[:, 1] = 0.0
    rnorm = radial / (np.linalg.norm(radial, axis=1, keepdims=True) + 1e-6)
    shapedirs = np.zeros((num_vertices, 3, num_betas), np.float32)
    shapedirs[:, :, 0] = 0.06 * v_template                      # stature
    shapedirs[:, 0, 1] = 0.05 * v_template[:, 0]                # width
    shapedirs[:, 2, 1] = 0.05 * v_template[:, 2]
    shapedirs[:, :, 2] = 0.012 * rnorm                          # girth
    for k in range(3, num_betas):                               # smooth modes
        freq = rng.uniform(1.0, 3.0, 3)
        phase = rng.uniform(0, 2 * np.pi, 3)
        amp = 0.004 * rng.randn(3)
        shapedirs[:, :, k] = amp * np.sin(
            freq * v_template[:, 1:2] * 4.0 + phase)

    return {
        "v_template": v_template, "faces": faces,
        "lbs_weights": lbs_weights, "J_regressor": J_regressor,
        "shapedirs": shapedirs, "parents": SMPL_PARENTS.copy(),
        "part_id": skin[:, 0].astype(np.int32),
    }


def humanoid_smpl_model(num_vertices: int = 6890, num_betas: int = 10,
                        seed: int = 0) -> SMPLModel:
    """SMPLModel with humanoid geometry (drop-in for synthetic_smpl_model)."""
    rng = np.random.RandomState(seed + 17)
    g = build_humanoid(num_vertices, num_betas, seed)
    J = NUM_SMPL_JOINTS
    v_template = g["v_template"]

    # pose blendshapes: zero (bending is carried entirely by LBS here)
    posedirs = np.zeros(((J - 1) * 9, num_vertices * 3), np.float32)

    # 21 picked surface keypoints near extremities (for the OpenPose extra
    # slots: toes, heels, face points, ...): nearest vertex to offsets
    targets = np.concatenate([
        _TPOSE[[_J[n] for n in ("l_foot", "r_foot", "l_ankle", "r_ankle",
                                "l_hand", "r_hand", "head")]],
        _TPOSE[_J["head"]] + np.asarray(
            [[0.0, 0.16, 0.0], [0.0, 0.10, 0.09], [0.04, 0.12, 0.07],
             [-0.04, 0.12, 0.07], [0.07, 0.10, 0.0], [-0.07, 0.10, 0.0]],
            np.float32),
        _TPOSE[[_J[n] for n in ("l_knee", "r_knee", "l_elbow", "r_elbow",
                                "l_wrist", "r_wrist", "neck", "pelvis")]],
    ], 0)
    d = np.linalg.norm(v_template[None] - targets[:, None], axis=-1)
    extra_ids = np.argmin(d, axis=1).astype(np.int32)[:21]

    # J19 extra regressor: gaussians at 19 body landmarks
    lm = _TPOSE[[_J[n] for n in (
        "head", "neck", "r_shoulder", "r_elbow", "r_wrist", "l_shoulder",
        "l_elbow", "l_wrist", "r_hip", "r_knee", "r_ankle", "l_hip",
        "l_knee", "l_ankle", "pelvis", "spine3", "spine2", "spine1",
        "head")]]
    dd = np.linalg.norm(v_template[None] - lm[:, None], axis=-1)
    jre = np.exp(-(dd / 0.06) ** 2) + 1e-8
    jre /= jre.sum(1, keepdims=True)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(g["shapedirs"]),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(g["J_regressor"]),
        lbs_weights=jnp.asarray(g["lbs_weights"]),
        parents=g["parents"],
        faces=g["faces"],
        extra_vertex_ids=extra_ids,
        joint_regressor_extra=jnp.asarray(jre.astype(np.float32)),
    )


def humanoid_smplh_model(num_vertices: int = 6890, num_betas: int = 10,
                         seed: int = 0) -> SMPLModel:
    """52-joint SMPL-H-topology humanoid (for the tokenizer's mesh loss).

    Joints 0..21 are the SMPL body tree (wrists at 20/21, no l_hand/r_hand
    regressed joints); 22..36 / 37..51 are 5x3-joint finger chains rooted
    at each wrist (SMPL-H layout).  Finger joints are kinematic-only: the
    mesh's hand capsule stays skinned to the wrists, which matches how the
    tokenizer uses the model (hands always at rest,
    models/smpl.py:smplh_body_forward).
    """
    smpl = humanoid_smpl_model(num_vertices, num_betas, seed)
    J = 52
    parents = np.zeros(J, np.int64)
    parents[:22] = SMPL_PARENTS[:22]
    for side, wrist, base in ((0, 20, 22), (1, 21, 37)):
        for f in range(5):
            j0 = base + 3 * f
            parents[j0] = wrist
            parents[j0 + 1] = j0
            parents[j0 + 2] = j0 + 1

    # finger joint T-pose targets: short chains extending from the wrist
    sign = np.asarray([1.0, -1.0])
    targets = np.zeros((J, 3), np.float32)
    targets[:22] = _TPOSE[:22]
    for side in (0, 1):
        wrist = _TPOSE[_J["l_wrist" if side == 0 else "r_wrist"]]
        base = 22 + 15 * side
        for f in range(5):
            spread = (f - 2) * 0.012
            for k in range(3):
                targets[base + 3 * f + k] = wrist + np.asarray(
                    [sign[side] * (0.05 + 0.025 * k), 0.0, spread], np.float32)

    v_template = np.asarray(smpl.v_template)
    d = np.linalg.norm(v_template[None] - targets[:, None], axis=-1)
    J_regressor = (np.exp(-(d / 0.05) ** 2) + 1e-8).astype(np.float32)
    J_regressor /= J_regressor.sum(1, keepdims=True)

    lbs24 = np.asarray(smpl.lbs_weights)
    lbs_weights = np.zeros((num_vertices, J), np.float32)
    lbs_weights[:, :22] = lbs24[:, :22]
    # SMPL joints 22/23 (hands) don't exist in SMPL-H: fold their weight
    # back onto the wrists
    lbs_weights[:, 20] += lbs24[:, 22]
    lbs_weights[:, 21] += lbs24[:, 23]

    posedirs = np.zeros(((J - 1) * 9, num_vertices * 3), np.float32)
    return SMPLModel(
        v_template=smpl.v_template,
        shapedirs=smpl.shapedirs,
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=parents,
        faces=smpl.faces,
        extra_vertex_ids=np.asarray(smpl.extra_vertex_ids),
        joint_regressor_extra=smpl.joint_regressor_extra,
    )
