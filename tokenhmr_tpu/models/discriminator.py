"""HMR pose/shape GAN discriminator.

Capabilities of ref `tokenhmr/lib/models/discriminator.py`: per-joint
embedding (1x1 convs == per-joint shared MLP), 23 per-joint critic heads,
betas MLP critic, all-joints MLP critic -> (B, 25) outputs.

TPU-native shape: the reference's Conv2d(9->32, k1) over a (B, 9, 23, 1)
layout is just a shared Dense over the joint axis; the 23 separate
nn.Linear(32,1) heads become ONE (23, 32) einsum — same math, one matmul
instead of a 23-iteration Python loop.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_JOINTS = 23


class Discriminator(nn.Module):
    @nn.compact
    def __call__(self, body_pose: jax.Array, betas: jax.Array) -> jax.Array:
        """body_pose (B, 23, 3, 3) or (B, 207); betas (B, 10) -> (B, 25)."""
        B = body_pose.shape[0]
        poses = body_pose.reshape(B, NUM_JOINTS, 9)

        # shared per-joint embedding (ref D_conv1/D_conv2, 1x1 convs)
        h = nn.Dense(32, name="conv1")(poses)
        h = nn.relu(h)
        h = nn.Dense(32, name="conv2")(h)
        h = nn.relu(h)                                    # (B, 23, 32)

        # 23 per-joint critics as one batched projection
        w = self.param("pose_out_kernel", nn.initializers.xavier_uniform(),
                       (NUM_JOINTS, 32, 1))
        b = self.param("pose_out_bias", nn.initializers.zeros, (NUM_JOINTS, 1))
        poses_out = (jnp.einsum("bjc,jco->bjo", h, w) + b)[:, :, 0]  # (B, 23)

        # betas critic
        hb = nn.relu(nn.Dense(10, name="betas_fc1")(betas))
        hb = nn.relu(nn.Dense(5, name="betas_fc2")(hb))
        betas_out = nn.Dense(1, name="betas_out")(hb)     # (B, 1)

        # all-joints critic
        ha = h.reshape(B, -1)
        ha = nn.relu(nn.Dense(1024, name="alljoints_fc1")(ha))
        ha = nn.relu(nn.Dense(1024, name="alljoints_fc2")(ha))
        all_out = nn.Dense(1, name="alljoints_out")(ha)   # (B, 1)

        return jnp.concatenate([poses_out, betas_out, all_out], axis=1)


def discriminator_losses(disc_fake_out, disc_real_out):
    """LSGAN losses (ref tokenhmr.py:340-367): fake->0, real->1."""
    B = disc_fake_out.shape[0]
    loss_fake = jnp.sum((disc_fake_out - 0.0) ** 2) / B
    loss_real = jnp.sum((disc_real_out - 1.0) ** 2) / B
    return loss_fake + loss_real


def generator_adv_loss(disc_out):
    """Generator side (ref tokenhmr.py:390-392): push critic outputs to 1."""
    return jnp.sum((disc_out - 1.0) ** 2) / disc_out.shape[0]
