"""TPU-native SMPL / SMPL-H body model.

The reference delegates all body-model math to the third-party `smplx`
package (ref `tokenhmr/lib/models/smpl_wrapper.py`, `tokenization/models/
vanilla_pose_vqvae.py:12-17`).  Here the full pipeline — shape blendshapes,
pose-corrective blendshapes, joint regression, forward kinematics and linear
blend skinning — is implemented as batched einsums over a static kinematic
tree, so XLA maps everything onto the MXU and fuses the elementwise tails.

Model data is a registered pytree (`SMPLModel`), so it can be donated,
sharded (replicated) with the params, and closed over in jit without
retracing.  Loads the standard SMPL/SMPL-H artifacts (.pkl with chumpy
arrays, or .npz) — the same files the reference consumes — plus a
deterministic synthetic model for hermetic tests.

Conventions match smplx's `SMPLLayer`/`SMPLHLayer` (pose2rot=False path):
inputs are rotation matrices; joints are regressed from shaped (not posed)
vertices for the kinematic tree, and the output joint set is
[J regressed from posed vertices; extra vertex-picked keypoints].
"""
from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Public constants (SMPL ecosystem data, not code)
# ---------------------------------------------------------------------------

# Vertex indices for extra keypoints appended after the regressed joints,
# in smplx's order: face (nose, reye, leye, rear, lear), feet (LBigToe,
# LSmallToe, LHeel, RBigToe, RSmallToe, RHeel), hand tips (lthumb, lindex,
# lmiddle, lring, lpinky, rthumb, rindex, rmiddle, rring, rpinky).
SMPL_EXTRA_VERTEX_IDS = np.array(
    [332, 6260, 2800, 4071, 583,           # face
     3216, 3226, 3387, 6617, 6624, 6787,   # feet
     2746, 2319, 2445, 2556, 2673,         # left hand tips
     6191, 5782, 5905, 6016, 6133],        # right hand tips
    dtype=np.int32,
)
# SMPL-H shares the SMPL mesh topology, so the same vertex ids apply.

# 45-joint (24 regressed + 21 extra) -> 25 OpenPose body keypoints.
# Ref: `smpl_wrapper.py:19-24`.
SMPL_TO_OPENPOSE = np.array(
    [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
     25, 26, 27, 28, 29, 30, 31, 32, 33, 34],
    dtype=np.int32,
)

NUM_SMPL_JOINTS = 24       # incl. root
NUM_SMPLH_JOINTS = 52      # root + 21 body + 15 + 15 hands
NUM_BODY_JOINTS = 21       # articulated body joints (excl. root, hands)


# ---------------------------------------------------------------------------
# Model container
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SMPLModel:
    """Static body-model data as a pytree of jnp arrays."""

    v_template: jax.Array        # (V, 3)
    shapedirs: jax.Array         # (V, 3, num_betas)
    posedirs: jax.Array          # ((J-1)*9, V*3)   row-major pose-feature basis
    J_regressor: jax.Array       # (J, V)
    lbs_weights: jax.Array       # (V, J)
    parents: np.ndarray          # (J,) static int tree (aux, not traced)
    faces: np.ndarray            # (F, 3) static (aux)
    extra_vertex_ids: np.ndarray  # (E,) static (aux)
    joint_regressor_extra: Optional[jax.Array] = None  # (19, V) J19 extras

    @property
    def num_joints(self) -> int:
        return int(self.J_regressor.shape[0])

    @property
    def num_vertices(self) -> int:
        return int(self.v_template.shape[0])

    def tree_flatten(self):
        children = (
            self.v_template, self.shapedirs, self.posedirs,
            self.J_regressor, self.lbs_weights, self.joint_regressor_extra,
        )
        aux = (self.parents, self.faces, self.extra_vertex_ids)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        v_template, shapedirs, posedirs, J_regressor, lbs_weights, jre = children
        parents, faces, extra_vertex_ids = aux
        return cls(v_template, shapedirs, posedirs, J_regressor, lbs_weights,
                   parents, faces, extra_vertex_ids, jre)


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

class _ChumpyUnpickler(pickle.Unpickler):
    """Unpickle legacy SMPL .pkl files without chumpy installed.

    The original artifacts store chumpy arrays; we substitute a tiny shim
    whose __setstate__ keeps only the underlying ndarray.
    """

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChArrayShim
        return super().find_class(module, name)


class _ChArrayShim:
    def __setstate__(self, state):
        self.__dict__.update(state)

    def __array__(self, dtype=None):
        for key in ("x", "_data", "a"):
            if key in self.__dict__:
                arr = np.asarray(self.__dict__[key])
                return arr.astype(dtype) if dtype else arr
        raise ValueError("cannot extract array from chumpy shim")


def _to_np(x) -> np.ndarray:
    if hasattr(x, "toarray"):  # scipy sparse (J_regressor in some releases)
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_smpl_model(
    path: str,
    num_betas: int = 10,
    joint_regressor_extra: Optional[str] = None,
    dtype=jnp.float32,
) -> SMPLModel:
    """Load an SMPL/SMPL-H artifact (.pkl or .npz) into an SMPLModel.

    Consumes the same files the reference does (`fetch_demo_data.sh`
    downloads; `smpl_wrapper.py:10` / `vanilla_pose_vqvae.py:16` load).
    """
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            data = _ChumpyUnpickler(f, encoding="latin1").load()

    v_template = _to_np(data["v_template"]).astype(np.float32)
    shapedirs = _to_np(data["shapedirs"]).astype(np.float32)[..., :num_betas]
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    # store as (P, V*3) for a single matmul
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    J_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    lbs_weights = _to_np(data["weights"]).astype(np.float32)
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    faces = _to_np(data["f"]).astype(np.int64)

    jre = None
    if joint_regressor_extra is not None:
        with open(joint_regressor_extra, "rb") as f:
            jre = jnp.asarray(
                np.asarray(pickle.load(f, encoding="latin1"), dtype=np.float32)
            )

    return SMPLModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        J_regressor=jnp.asarray(J_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        parents=np.asarray(parents),
        faces=faces,
        extra_vertex_ids=SMPL_EXTRA_VERTEX_IDS.copy(),
        joint_regressor_extra=jre,
    )


def synthetic_smpl_model(
    num_vertices: int = 400,
    num_joints: int = NUM_SMPL_JOINTS,
    num_betas: int = 10,
    seed: int = 0,
    with_extra_regressor: bool = True,
) -> SMPLModel:
    """Deterministic small random body model for hermetic tests/benchmarks.

    Structurally identical to a real SMPL artifact (valid kinematic tree,
    row-normalized regressors/weights), so every code path downstream is
    exercised without the registration-gated artifact downloads.
    """
    rng = np.random.RandomState(seed)
    V, J, B = num_vertices, num_joints, num_betas
    v_template = rng.randn(V, 3).astype(np.float32) * 0.3
    shapedirs = rng.randn(V, 3, B).astype(np.float32) * 0.01
    posedirs = (rng.randn(V * 3, (J - 1) * 9).astype(np.float32) * 0.001).T
    J_regressor = rng.rand(J, V).astype(np.float32)
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)
    lbs_weights = rng.rand(V, J).astype(np.float32) ** 4
    lbs_weights /= lbs_weights.sum(axis=1, keepdims=True)
    parents = np.zeros(J, dtype=np.int64)
    parents[0] = -1
    for j in range(1, J):
        parents[j] = rng.randint(0, j)  # valid topological order
    faces = rng.randint(0, V, (2 * V, 3)).astype(np.int64)
    extra_ids = rng.choice(V, size=21, replace=False).astype(np.int32)
    jre = None
    if with_extra_regressor:
        jre_np = rng.rand(19, V).astype(np.float32)
        jre_np /= jre_np.sum(axis=1, keepdims=True)
        jre = jnp.asarray(jre_np)
    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=parents,
        faces=faces,
        extra_vertex_ids=extra_ids,
        joint_regressor_extra=jre,
    )


# ---------------------------------------------------------------------------
# Core LBS forward
# ---------------------------------------------------------------------------

def _rigid_transforms(
    rot_mats: jax.Array, joints: jax.Array, parents: np.ndarray
) -> Tuple[jax.Array, jax.Array]:
    """Forward kinematics over the static tree.

    rot_mats: (N, J, 3, 3); joints: (N, J, 3) rest positions.
    Returns posed joint locations (N, J, 3) and the relative skinning
    transforms (N, J, 4, 4).

    The tree is static so the chain is unrolled in Python at trace time —
    XLA sees a fixed sequence of small (N, 3, 3) matmuls, no dynamic
    control flow.  J <= 52, so the unroll is cheap to compile.
    """
    N, J = rot_mats.shape[0], rot_mats.shape[1]
    rel_joints = joints.at[:, 1:].add(-joints[:, np.asarray(parents[1:])])

    # per-joint local transform [R | t]
    def make_tf(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)          # (..., 3, 4)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)              # (..., 4, 4)

    local = make_tf(rot_mats, rel_joints)                           # (N, J, 4, 4)

    chains = [local[:, 0]]
    for j in range(1, J):
        chains.append(chains[int(parents[j])] @ local[:, j])
    world = jnp.stack(chains, axis=1)                               # (N, J, 4, 4)

    posed_joints = world[:, :, :3, 3]

    # subtract the rest-pose joint contribution: A = world - [0 | world_rot @ j]
    rot_j = jnp.einsum("njab,njb->nja", world[:, :, :3, :3], joints)
    rel = world.at[:, :, :3, 3].add(-rot_j)
    return posed_joints, rel


def lbs(
    model: SMPLModel,
    betas: jax.Array,        # (N, B)
    full_pose: jax.Array,    # (N, J, 3, 3) rotation matrices (root first)
) -> Tuple[jax.Array, jax.Array]:
    """Linear blend skinning. Returns (vertices (N, V, 3), joints (N, J, 3)).

    Equivalent to smplx.lbs with pose2rot=False, expressed as einsums:
      v_shaped = T + S·β ;  J = R_J v_shaped ;  v_posed += P·(R−I) ;
      G = FK(R, J) ;  v = W·G ∘ v_posed.
    """
    N = betas.shape[0]
    dtype = model.v_template.dtype
    betas = betas.astype(dtype)
    full_pose = full_pose.astype(dtype)

    # shape blendshapes: (V,3,B)·(N,B) -> (N,V,3)
    v_shaped = model.v_template + jnp.einsum(
        "vdb,nb->nvd", model.shapedirs, betas, preferred_element_type=jnp.float32
    )

    # rest joints
    joints_rest = jnp.einsum(
        "jv,nvd->njd", model.J_regressor, v_shaped, preferred_element_type=jnp.float32
    )

    # pose-corrective blendshapes from (R - I) of non-root joints
    eye = jnp.eye(3, dtype=dtype)
    pose_feature = (full_pose[:, 1:] - eye).reshape(N, -1)          # (N, (J-1)*9)
    pose_offsets = (pose_feature @ model.posedirs).reshape(N, -1, 3)
    v_posed = v_shaped + pose_offsets

    # forward kinematics + skinning transforms
    posed_joints, A = _rigid_transforms(full_pose, joints_rest, model.parents)

    # W·A: (V,J)·(N,J,4,4) -> (N,V,4,4)
    T = jnp.einsum(
        "vj,njab->nvab", model.lbs_weights, A, preferred_element_type=jnp.float32
    )
    verts = (
        jnp.einsum("nvab,nvb->nva", T[:, :, :3, :3], v_posed) + T[:, :, :3, 3]
    )
    return verts, posed_joints


# ---------------------------------------------------------------------------
# Layer-style wrappers mirroring the reference's SMPL wrapper contract
# ---------------------------------------------------------------------------

def smpl_forward_numpy(
    model: SMPLModel,
    betas: np.ndarray,            # (B,) betas (N, B)
    full_pose_aa: np.ndarray,     # (N, J*3) axis-angle
) -> Dict[str, np.ndarray]:
    """Pure-numpy LBS for HOST-side data pipelines (e.g. BEDLAM gt keypoint
    derivation, ref `bedlam_dataset_tar.py:165-174`, which must run before
    cropping and therefore cannot batch onto the device).  Single-item cost
    is a few ms; dataloader workers parallelize it.
    """
    v_template = np.asarray(model.v_template)
    shapedirs = np.asarray(model.shapedirs)
    posedirs = np.asarray(model.posedirs)
    J_reg = np.asarray(model.J_regressor)
    W = np.asarray(model.lbs_weights)
    parents = model.parents
    N = betas.shape[0]
    J = J_reg.shape[0]

    aa = full_pose_aa.reshape(N, J, 3)
    angle = np.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / np.maximum(angle, 1e-8)
    K = np.zeros((N, J, 3, 3), np.float32)
    K[..., 0, 1], K[..., 0, 2] = -axis[..., 2], axis[..., 1]
    K[..., 1, 0], K[..., 1, 2] = axis[..., 2], -axis[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -axis[..., 1], axis[..., 0]
    s = np.sin(angle)[..., None]
    c = np.cos(angle)[..., None]
    R = np.eye(3, dtype=np.float32) + s * K + (1 - c) * (K @ K)

    v_shaped = v_template[None] + np.einsum("vdb,nb->nvd", shapedirs, betas)
    joints = np.einsum("jv,nvd->njd", J_reg, v_shaped)
    pose_feat = (R[:, 1:] - np.eye(3, dtype=np.float32)).reshape(N, -1)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(N, -1, 3)

    G = np.zeros((N, J, 4, 4), np.float32)
    for j in range(J):
        local = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
        local[:, :3, :3] = R[:, j]
        if j == 0:
            local[:, :3, 3] = joints[:, j]
            G[:, j] = local
        else:
            local[:, :3, 3] = joints[:, j] - joints[:, parents[j]]
            G[:, j] = G[:, parents[j]] @ local
    A = G.copy()
    A[:, :, :3, 3] -= np.einsum("njab,njb->nja", G[:, :, :3, :3], joints)
    T = np.einsum("vj,njab->nvab", W, A)
    verts = np.einsum("nvab,nvb->nva", T[:, :, :3, :3], v_posed) + T[:, :, :3, 3]
    out_joints = np.einsum("jv,nvd->njd", J_reg, verts)
    extra = verts[:, np.asarray(model.extra_vertex_ids)]
    return {"vertices": verts,
            "joints": np.concatenate([out_joints, extra], axis=1)}


def smpl_openpose_forward_numpy(
    model: SMPLModel,
    betas: np.ndarray,
    full_pose_aa: np.ndarray,
) -> Dict[str, np.ndarray]:
    """Host-side variant of `smpl_openpose_forward`: 25 OpenPose joints +
    19 extra-regressor joints (the 44-joint layout every keypoint table —
    flip permutation, TALS thresholds, PELVIS_ID — indexes)."""
    out = smpl_forward_numpy(model, betas, full_pose_aa)
    joints = out["joints"][:, SMPL_TO_OPENPOSE]
    if model.joint_regressor_extra is None:
        raise ValueError(
            "smpl_openpose_forward_numpy needs joint_regressor_extra (the "
            "SMPL_to_J19 regressor) to produce the 44-joint layout"
        )
    extra = np.einsum(
        "jv,nvd->njd", np.asarray(model.joint_regressor_extra), out["vertices"]
    )
    return {"vertices": out["vertices"],
            "joints": np.concatenate([joints, extra], axis=1)}


def smpl_forward(
    model: SMPLModel,
    betas: jax.Array,                         # (N, B)
    global_orient: jax.Array,                 # (N, 1, 3, 3)
    body_pose: jax.Array,                     # (N, J-1, 3, 3)
) -> Dict[str, jax.Array]:
    """smplx.SMPLLayer-equivalent forward (pose2rot=False).

    Returns vertices (N, V, 3) and joints (N, J+E, 3): the regressed
    kinematic joints followed by the extra vertex-picked keypoints.
    """
    full_pose = jnp.concatenate([global_orient, body_pose], axis=1)
    verts, _ = lbs(model, betas, full_pose)
    joints = jnp.einsum(
        "jv,nvd->njd", model.J_regressor, verts, preferred_element_type=jnp.float32
    )
    extra = verts[:, np.asarray(model.extra_vertex_ids)]
    joints = jnp.concatenate([joints, extra], axis=1)
    return {"vertices": verts, "joints": joints}


def smpl_openpose_forward(
    model: SMPLModel,
    betas: jax.Array,
    global_orient: jax.Array,
    body_pose: jax.Array,
    update_hips: bool = False,
) -> Dict[str, jax.Array]:
    """The reference's extended SMPL wrapper (ref `smpl_wrapper.py:27-41`):
    remap to 25 OpenPose joints, optionally widen hips, append the 19
    extra-regressor joints -> 44 joints total.
    """
    out = smpl_forward(model, betas, global_orient, body_pose)
    joints = out["joints"][:, SMPL_TO_OPENPOSE]
    if update_hips:
        hips = joints[:, [9, 12]]
        swapped = joints[:, [12, 9]]
        mid = joints[:, [8]]
        joints = joints.at[:, [9, 12]].set(
            hips + 0.25 * (hips - swapped) + 0.5 * (mid - 0.5 * (hips + swapped))
        )
    if model.joint_regressor_extra is not None:
        extra = jnp.einsum(
            "jv,nvd->njd",
            model.joint_regressor_extra,
            out["vertices"],
            preferred_element_type=jnp.float32,
        )
        joints = jnp.concatenate([joints, extra], axis=1)
    return {"vertices": out["vertices"], "joints": joints}


def smplh_body_forward(
    model: SMPLModel,
    body_pose: jax.Array,                     # (N, 21, 3, 3)
    betas: Optional[jax.Array] = None,
    global_orient: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """SMPL-H forward with only body pose set (hands flat), matching the
    tokenizer's use `body_model(body_pose=rotmats)`
    (ref `vanilla_pose_vqvae.py:186`).
    """
    N = body_pose.shape[0]
    J = model.num_joints
    dtype = model.v_template.dtype
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (N, 1, 3, 3))
    if global_orient is None:
        global_orient = eye
    if betas is None:
        betas = jnp.zeros((N, model.shapedirs.shape[-1]), dtype)
    rest = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (N, J - 1 - NUM_BODY_JOINTS, 3, 3))
    full_body = jnp.concatenate([body_pose.astype(dtype), rest], axis=1)
    return smpl_forward(model, betas, global_orient, full_body)
