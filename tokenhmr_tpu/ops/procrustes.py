"""Batched Procrustes (similarity-transform) alignment.

Ref behavior: `tokenhmr/lib/utils/pose_utils.py:61-143`.  SVD runs in fp32
(TPU has no fp64 and the metric is mm-scale, fp32 is ample).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_similarity_transform(S1: jax.Array, S2: jax.Array) -> jax.Array:
    """Align S1 (B, N, 3) to S2 (B, N, 3) with scale+rotation+translation.

    Returns S1 after the optimal similarity transform (orthogonal Procrustes
    with scale), matching ref `pose_utils.py:61-114`.
    """
    S1 = S1.astype(jnp.float32)
    S2 = S2.astype(jnp.float32)
    X1t = jnp.swapaxes(S1, -1, -2)  # (B, 3, N)
    X2t = jnp.swapaxes(S2, -1, -2)
    mu1 = X1t.mean(axis=-1, keepdims=True)
    mu2 = X2t.mean(axis=-1, keepdims=True)
    X1 = X1t - mu1
    X2 = X2t - mu2

    var1 = jnp.sum(X1 * X1, axis=(-1, -2))
    K = X1 @ jnp.swapaxes(X2, -1, -2)  # (B, 3, 3)

    U, s, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)
    detUVt = jnp.linalg.det(U @ Vh)
    Z = jnp.broadcast_to(jnp.eye(3, dtype=S1.dtype), K.shape).copy()
    Z = Z.at[..., -1, -1].set(jnp.sign(detUVt))

    R = V @ Z @ jnp.swapaxes(U, -1, -2)
    trace = jnp.trace(R @ K, axis1=-2, axis2=-1)
    scale = (trace / var1)[..., None, None]
    t = mu2 - scale * (R @ mu1)
    S1_hat = scale * (R @ X1t) + t
    return jnp.swapaxes(S1_hat, -1, -2)


def reconstruction_error(S1: jax.Array, S2: jax.Array) -> jax.Array:
    """Mean per-point distance after Procrustes alignment (B,)."""
    S1_hat = compute_similarity_transform(S1, S2)
    return jnp.sqrt(jnp.sum((S1_hat - S2) ** 2, axis=-1)).mean(axis=-1)


def eval_pose(pred_joints: jax.Array, gt_joints: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(MPJPE, PA-MPJPE) per sample, in mm.  Ref: `pose_utils.py:129-143`."""
    mpjpe = jnp.sqrt(jnp.sum((pred_joints - gt_joints) ** 2, axis=-1)).mean(axis=-1)
    re = reconstruction_error(pred_joints, gt_joints)
    return 1000.0 * mpjpe, 1000.0 * re
