"""Rotation representation conversions (single source of truth).

The reference carries three near-identical copies of this functionality
(`tokenhmr/lib/utils/rotation_utils.py`, `tokenization/models/rotation_utils.py`,
`tokenization/utils/rotation_conversions.py`, plus `tokenhmr/lib/utils/geometry.py`);
this module is the one rotations library for the whole framework.

Conventions:
  * quaternions are (w, x, y, z), unit-norm assumed unless noted
  * rotation matrices act on column vectors (R @ v)
  * the 6D representation follows TokenHMR's convention
    (ref `tokenhmr/lib/utils/geometry.py:68-84`): the 6 numbers are two
    3-vectors a1 = x[0:3], a2 = x[3:6]; Gram-Schmidt gives b1, b2, b3 and the
    matrix is ROW-stacked [[b1], [b2], [b3]].  `matrix_to_rotation_6d` takes
    the first two ROWS (ref `geometry.py:46-62`), so the pair round-trips.
    HMR2.0 used column stacking; pass ``convention="hmr2"`` for that.

Everything is pure jnp, shape-polymorphic over leading batch dims, and safe
under jit/vmap/grad.  fp32 is used internally for the trig/normalization
paths regardless of input dtype (mirrors the bf16 workaround at ref
`geometry.py:78-82`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _f32(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


# ---------------------------------------------------------------------------
# quaternion <-> matrix
# ---------------------------------------------------------------------------

def quaternion_to_matrix(quat: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    in_dtype = quat.dtype
    q = _f32(quat)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            ww + xx - yy - zz, 2 * (xy - wz), 2 * (wy + xz),
            2 * (wz + xy), ww - xx + yy - zz, 2 * (yz - wx),
            2 * (xz - wy), 2 * (wx + yz), ww - xx - yy + zz,
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))
    return m.astype(in_dtype)


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) wxyz quaternion with non-negative w.

    Branch-free variant of the Shepperd method: compute all four candidate
    quaternions and select by the largest denominator, which is numerically
    stable for every rotation (the standard single-branch trace formula fails
    near angle pi).
    """
    in_dtype = matrix.dtype
    m = _f32(matrix)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # squared magnitudes of the 4 components (up to common scale)
    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs2, 0.0))

    # candidate quaternions, one per dominant component
    quat_by_w = jnp.stack([q_abs2[..., 0], m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs2[..., 1], m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs2[..., 2], m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs2[..., 3]], axis=-1)
    quat_candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)
    denom = 2.0 * jnp.maximum(q_abs, 0.1 * _EPS)
    quat_candidates = quat_candidates / denom[..., None]

    best = jnp.argmax(q_abs2, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    # canonical sign: w >= 0
    quat = jnp.where(quat[..., :1] < 0, -quat, quat)
    quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    return quat.astype(in_dtype)


# ---------------------------------------------------------------------------
# axis-angle <-> quaternion / matrix
# ---------------------------------------------------------------------------

def axis_angle_to_quaternion(aa: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 4) wxyz quaternion (sinc-stable at 0)."""
    in_dtype = aa.dtype
    a = _f32(aa)
    angle = jnp.linalg.norm(a, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(half)/angle with Taylor fallback near zero
    small = angle < 1e-6
    sin_half_over_angle = jnp.where(
        small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.maximum(angle, _EPS)
    )
    quat = jnp.concatenate([jnp.cos(half), a * sin_half_over_angle], axis=-1)
    return quat.astype(in_dtype)


def quaternion_to_axis_angle(quat: jax.Array) -> jax.Array:
    """(..., 4) wxyz -> (..., 3) axis-angle."""
    in_dtype = quat.dtype
    q = _f32(quat)
    q = jnp.where(q[..., :1] < 0, -q, q)  # w >= 0 -> angle in [0, pi]
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(sin_half, q[..., :1])
    angle = 2.0 * half
    small = sin_half < 1e-6
    scale = jnp.where(small, 2.0 + angle * angle / 12.0, angle / jnp.maximum(sin_half, _EPS))
    return (q[..., 1:] * scale).astype(in_dtype)


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3).  Ref: `geometry.py:5-21` (via quaternion)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# ---------------------------------------------------------------------------
# 6D <-> matrix
# ---------------------------------------------------------------------------

def rotation_6d_to_matrix(x: jax.Array, convention: str = "tokenhmr") -> jax.Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (Zhou et al. CVPR'19).

    ``convention="tokenhmr"`` row-stacks the orthonormal basis (the released
    TokenHMR weights; ref `geometry.py:84`); ``"hmr2"`` column-stacks
    (original HMR2.0; ref `geometry.py:83`).
    """
    in_dtype = x.dtype
    v = _f32(x)
    a1, a2 = v[..., 0:3], v[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    if convention == "tokenhmr":
        m = jnp.stack([b1, b2, b3], axis=-2)  # rows
    elif convention == "hmr2":
        m = jnp.stack([b1, b2, b3], axis=-1)  # columns
    else:
        raise ValueError(f"unknown 6D convention: {convention}")
    return m.astype(in_dtype)


def matrix_to_rotation_6d(matrix: jax.Array, convention: str = "tokenhmr") -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two rows (tokenhmr) / columns (hmr2).

    Ref: `geometry.py:46-62` (rows) — round-trips with rotation_6d_to_matrix.
    """
    if convention == "tokenhmr":
        six = matrix[..., :2, :]
    elif convention == "hmr2":
        six = jnp.swapaxes(matrix[..., :, :2], -1, -2)
    else:
        raise ValueError(f"unknown 6D convention: {convention}")
    return six.reshape(matrix.shape[:-2] + (6,))


# ---------------------------------------------------------------------------
# Euler <-> matrix
# ---------------------------------------------------------------------------

_AXIS_VEC = {"X": (1.0, 0.0, 0.0), "Y": (0.0, 1.0, 0.0), "Z": (0.0, 0.0, 1.0)}


def _axis_angle_single(axis: str, angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(axis)
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler: jax.Array, convention: str = "XYZ") -> jax.Array:
    """(..., 3) intrinsic Euler angles -> (..., 3, 3)."""
    if len(convention) != 3:
        raise ValueError("convention must have 3 letters")
    ms = [_axis_angle_single(c, euler[..., i]) for i, c in enumerate(convention)]
    return ms[0] @ ms[1] @ ms[2]


def matrix_to_euler_angles(matrix: jax.Array, convention: str = "XYZ") -> jax.Array:
    """(..., 3, 3) -> (..., 3) intrinsic Euler angles (Tait-Bryan only)."""
    m = _f32(matrix)
    # closed-form per-convention extraction (sufficient generality for our use)
    if convention == "XYZ":
        a0 = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
        a1 = jnp.arcsin(jnp.clip(m[..., 0, 2], -1, 1))
        a2 = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    elif convention == "ZYX":
        a0 = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
        a1 = jnp.arcsin(jnp.clip(-m[..., 2, 0], -1, 1))
        a2 = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    else:
        raise NotImplementedError(f"convention {convention} not implemented")
    return jnp.stack([a0, a1, a2], axis=-1).astype(matrix.dtype)


# ---------------------------------------------------------------------------
# angles / distances
# ---------------------------------------------------------------------------

def acos_linear_extrapolation(x: jax.Array, bounds: float = 1.0 - 1e-4) -> jax.Array:
    """arccos with linear extrapolation outside [-bounds, bounds].

    Keeps gradients finite near +-1 (ref `rotation_utils.py:651+`).
    """
    lower, upper = -bounds, bounds
    acos_b = jnp.arccos(jnp.asarray(bounds, x.dtype))
    dacos_b = -1.0 / jnp.sqrt(1.0 - bounds * bounds)
    inside = jnp.arccos(jnp.clip(x, lower, upper))
    above = acos_b + (x - upper) * dacos_b
    below = (jnp.pi - acos_b) + (x - lower) * dacos_b
    return jnp.where(x <= lower, below, jnp.where(x >= upper, above, inside))


def so3_rotation_angle(R: jax.Array, eps: float = 1e-4, cos_angle: bool = False) -> jax.Array:
    """Angle of each rotation in (..., 3, 3)."""
    tr = jnp.trace(_f32(R), axis1=-2, axis2=-1)
    phi_cos = (tr - 1.0) * 0.5
    if cos_angle:
        return phi_cos.astype(R.dtype)
    return acos_linear_extrapolation(phi_cos, 1.0 - eps).astype(R.dtype)


def so3_relative_angle(R1: jax.Array, R2: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Angle of R1 @ R2^T (ref `rotation_utils.py` so3_relative_angle)."""
    return so3_rotation_angle(R1 @ jnp.swapaxes(R2, -1, -2), eps=eps)


def joint_angle_error(pred_mat: jax.Array, gt_mat: jax.Array) -> jax.Array:
    """Per-joint geodesic angle between (B, J, 3, 3) rotation sets.

    Ref: `tokenhmr/lib/models/losses.py:22-33` (via axis-angle norm, which
    equals the geodesic angle).
    """
    r = pred_mat @ jnp.swapaxes(gt_mat, -1, -2)
    aa = matrix_to_axis_angle(r)
    return jnp.linalg.norm(aa, axis=-1)


# ---------------------------------------------------------------------------
# sampling / canonicalization helpers
# ---------------------------------------------------------------------------

def random_quaternions(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    q = jax.random.normal(key, (n, 4), dtype=jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q.astype(dtype)


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """n uniform random rotation matrices (ref `rotation_conversions.py:262`)."""
    return quaternion_to_matrix(random_quaternions(key, n, dtype))


def standardize_quaternion(quat: jax.Array) -> jax.Array:
    """Force w >= 0."""
    return jnp.where(quat[..., :1] < 0, -quat, quat)
