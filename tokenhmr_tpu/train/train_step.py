"""TokenHMR training step: forward + TALS loss + grad-clip + AdamW, one
jitted SPMD program.

Replaces ref `tokenhmr.py:369-419` (Lightning manual-optimization
training_step): no framework loop, no manual_backward — the step is a pure
function over (params, opt_state, batch, rng), sharded by placing params
(replicated or fsdp) and batch (data-sharded) on the mesh; XLA inserts the
gradient all-reduce over ICI (SURVEY.md §2.8).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.tokenhmr import TokenHMRConfig, forward_step
from .losses import compute_tokenhmr_loss, token_loss


def make_optimizer(
    lr: float = 1e-5,
    weight_decay: float = 1e-4,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + global-norm clip (ref configure_optimizers tokenhmr.py:116-133
    + grad clip :403-406)."""
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(lr, weight_decay=weight_decay))
    return optax.chain(*chain)


def make_train_step(
    cfg: TokenHMRConfig,
    smpl_model,
    frozen: Dict[str, Any],
    optimizer: optax.GradientTransformation,
    loss_weights: Optional[Dict[str, float]] = None,
    loose_sup: bool = True,
    loose_weight: float = 0.05,
    token_loss_weight: float = 0.0,
    compute_gt_tokens: bool = False,
    token_loss_objective: str = "logp",
) -> Callable:
    """Returns train_step(params, opt_state, batch, rng) ->
    (params, opt_state, metrics).

    With compute_gt_tokens=True and token_loss_weight>0, ground-truth token
    ids are derived inside the step by running the FROZEN PoseVQ encoder on
    the gt body pose (the PCT training recipe: `Img -> Classifier -> class`
    vs `Joints -> Encoder -> gt class`, ref token_classifier.py:36-39) —
    no host-side token precompute needed.
    """
    lw = loss_weights or {}

    def _gt_tokens_from_pose(batch):
        from ..models.posevq import posevq_encode
        from ..ops.rotations import matrix_to_rotation_6d

        gt_bp = batch["smpl_params"]["body_pose"][:, :21]     # (B, 21, 3, 3)
        gt_6d = matrix_to_rotation_6d(gt_bp)
        return jax.lax.stop_gradient(
            posevq_encode(frozen["params"], cfg.posevq, frozen["vq_state"], gt_6d)
        )

    def train_step(params, opt_state, batch, rng):
        r_dp, r_do = jax.random.split(rng)

        def loss_fn(p):
            out = forward_step(
                p, frozen, cfg, smpl_model, batch["img"], train=True,
                rngs={"drop_path": r_dp, "dropout": r_do},
            )
            total, losses = compute_tokenhmr_loss(
                out, batch, lw, loose_sup=loose_sup, loose_weight=loose_weight,
            )
            if token_loss_weight > 0:
                if "gt_tokens" in batch:
                    gt_tokens = batch["gt_tokens"]
                elif compute_gt_tokens:
                    gt_tokens = _gt_tokens_from_pose(batch)
                else:
                    gt_tokens = None
                if gt_tokens is not None:
                    # per-sample mask: tokens encoded from absent gt poses
                    # are noise and must contribute NO gradient
                    has = batch["has_smpl_params"]["body_pose"]
                    tl = token_loss(out["cls_logits_softmax"], gt_tokens,
                                    sample_weights=has,
                                    objective=token_loss_objective)
                    total = total + token_loss_weight * tl
                    losses["token"] = tl
            return total, losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt_state, metrics

    return train_step


def make_eval_step(cfg: TokenHMRConfig, smpl_model, frozen) -> Callable:
    def eval_step(params, batch):
        return forward_step(params, frozen, cfg, smpl_model, batch["img"], train=False)

    return eval_step


def make_adversarial_train_step(
    cfg: TokenHMRConfig,
    smpl_model,
    frozen: Dict[str, Any],
    optimizer: optax.GradientTransformation,
    disc_optimizer: optax.GradientTransformation,
    loss_weights: Optional[Dict[str, float]] = None,
    loose_sup: bool = True,
    loose_weight: float = 0.05,
    adv_weight: float = 0.0005,
) -> Callable:
    """Generator + discriminator joint step (ref tokenhmr.py:340-419 with
    LOSS_WEIGHTS.ADVERSARIAL > 0).  The mocap batch supplies real poses.

    One jitted program updates both players (the reference runs two separate
    backward passes through Lightning manual optimization).
    """
    from ..models.discriminator import (
        Discriminator, discriminator_losses, generator_adv_loss,
    )
    from ..ops.rotations import axis_angle_to_matrix

    lw = loss_weights or {}
    disc = Discriminator()

    def train_step(params, disc_params, opt_state, disc_opt_state,
                   batch, mocap_batch, rng):
        r_dp, r_do = jax.random.split(rng)

        def gen_loss_fn(p):
            out = forward_step(
                p, frozen, cfg, smpl_model, batch["img"], train=True,
                rngs={"drop_path": r_dp, "dropout": r_do},
            )
            total, losses = compute_tokenhmr_loss(
                out, batch, lw, loose_sup=loose_sup, loose_weight=loose_weight,
            )
            pred_bp = out["pred_smpl_params"]["body_pose"]
            pred_betas = out["pred_smpl_params"]["betas"]
            disc_out = disc.apply({"params": disc_params}, pred_bp, pred_betas)
            adv = generator_adv_loss(disc_out)
            total = total + adv_weight * adv
            losses["adv_gen"] = adv
            return total, (losses, pred_bp, pred_betas)

        (_, (losses, pred_bp, pred_betas)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # discriminator update on (fake = detached preds, real = mocap)
        gt_bp = axis_angle_to_matrix(mocap_batch["body_pose"].reshape(-1, 23, 3))

        def disc_loss_fn(dp):
            fake = disc.apply({"params": dp},
                              jax.lax.stop_gradient(pred_bp),
                              jax.lax.stop_gradient(pred_betas))
            real = disc.apply({"params": dp}, gt_bp, mocap_batch["betas"])
            return discriminator_losses(fake, real)

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(disc_params)
        d_updates, new_d_opt = disc_optimizer.update(
            d_grads, disc_opt_state, disc_params
        )
        new_disc_params = optax.apply_updates(disc_params, d_updates)
        losses["adv_disc"] = d_loss
        losses["grad_norm"] = optax.global_norm(grads)
        return new_params, new_disc_params, new_opt, new_d_opt, losses

    return train_step
