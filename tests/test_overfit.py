"""End-to-end learning sanity: the tiny flagship overfits one batch.

The strongest available correctness signal without released weights:
gradients flow through backbone -> head -> frozen tokenizer -> SMPL ->
projection and reduce the 2D reprojection loss on a fixed batch.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_tiny_flagship_overfits_fixed_batch():
    import __graft_entry__ as G
    from tokenhmr_tpu.models.tokenhmr import forward_step
    from tokenhmr_tpu.ops.rotations import axis_angle_to_matrix
    from tokenhmr_tpu.train.train_step import make_optimizer, make_train_step

    import dataclasses
    cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=2, tiny=True)
    # stochastic depth (0.55 in the default config) is pure noise for a
    # 2-sample overfit; turn it off
    cfg = dataclasses.replace(cfg, vit=dataclasses.replace(cfg.vit, drop_path_rate=0.0))

    # ground truth = outputs of a randomly perturbed model on fixed images
    rng = np.random.RandomState(0)
    B = 2
    img = jnp.asarray(rng.randn(B, 64, 48, 3).astype(np.float32))
    tgt = forward_step(params, frozen, cfg, smpl_model, img)
    gt_kp2d = jnp.concatenate(
        [tgt["pred_keypoints_2d"] + 0.05, jnp.ones((B, 44, 1))], axis=-1
    )
    gt_kp3d = jnp.concatenate(
        [tgt["pred_keypoints_3d"], jnp.ones((B, 44, 1))], axis=-1
    )
    rm = np.asarray(axis_angle_to_matrix(
        jnp.asarray(rng.randn(B, 24, 3).astype(np.float32) * 0.2)))
    batch = {
        "img": img,
        "keypoints_2d": gt_kp2d,
        "keypoints_3d": gt_kp3d,
        "smpl_params": {
            "global_orient": jnp.asarray(rm[:, :1]),
            "body_pose": jnp.asarray(rm[:, 1:]),
            "betas": jnp.zeros((B, 10)),
        },
        # keypoint-only objective: the random smpl-param "gt" would fight
        # the keypoint targets, so mask it out
        "has_smpl_params": {k: jnp.zeros(B) for k in
                            ("global_orient", "body_pose", "betas")},
        "valid_3d": jnp.ones(B),
    }

    opt = make_optimizer(5e-6, 0.0, 1.0)
    # plain (non-TALS) losses: deterministic target, no threshold gating
    step = jax.jit(make_train_step(
        cfg, smpl_model, frozen, opt, loose_sup=False,
        loss_weights={"KEYPOINTS_2D": 0.05, "KEYPOINTS_3D": 0.05,
                      "GLOBAL_ORIENT": 0.0, "BODY_POSE": 0.0, "BETAS": 0.0}))
    opt_state = opt.init(params)
    losses = []
    for i in range(120):
        params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.PRNGKey(i))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.6, f"no overfit: {losses[0]} -> {losses[-1]}"


@pytest.mark.slow
def test_token_ce_descends_when_dominant():
    """The two-stage token objective is TRAINABLE end to end: with the CE
    as the only loss (weight 1.0), Img -> classifier simplex CE against
    frozen-encoder gt tokens falls well below its uniform level ln(K).

    Context for the flagship run's flat `token` curve (run_r4 metrics):
    there the CE carries 0.02/|total| ~ 0.3% of the gradient — this test
    pins the wiring (forward_step -> cls_logits_softmax ->
    _gt_tokens_from_pose -> token_loss) so a flat curve at production
    weighting reads as a weighting choice, not a broken path.
    """
    import __graft_entry__ as G
    from tokenhmr_tpu.ops.rotations import axis_angle_to_matrix
    from tokenhmr_tpu.train.train_step import make_optimizer, make_train_step

    import dataclasses
    cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=2, tiny=True)
    cfg = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, drop_path_rate=0.0))

    rng = np.random.RandomState(1)
    B = 2
    rm = np.asarray(axis_angle_to_matrix(
        jnp.asarray(rng.randn(B, 24, 3).astype(np.float32) * 0.3)))
    batch = {
        "img": jnp.asarray(rng.randn(B, 64, 48, 3).astype(np.float32)),
        "keypoints_2d": jnp.zeros((B, 44, 3)),
        "keypoints_3d": jnp.zeros((B, 44, 4)),
        "smpl_params": {
            "global_orient": jnp.asarray(rm[:, :1]),
            "body_pose": jnp.asarray(rm[:, 1:]),
            "betas": jnp.zeros((B, 10)),
        },
        # body_pose flag doubles as the token-CE sample mask
        "has_smpl_params": {k: jnp.ones(B) for k in
                            ("global_orient", "body_pose", "betas")},
        "valid_3d": jnp.zeros(B),
    }

    opt = make_optimizer(3e-4, 0.0, 1.0)
    step = jax.jit(make_train_step(
        cfg, smpl_model, frozen, opt, loose_sup=False,
        loss_weights={"KEYPOINTS_2D": 0.0, "KEYPOINTS_3D": 0.0,
                      "GLOBAL_ORIENT": 0.0, "BODY_POSE": 0.0, "BETAS": 0.0},
        token_loss_weight=1.0, compute_gt_tokens=True,
        token_loss_objective="logp"))
    opt_state = opt.init(params)
    ce = []
    for i in range(100):
        params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.PRNGKey(i))
        ce.append(float(metrics["token"]))
    uniform = np.log(cfg.posevq.nb_code)               # ln(32) ~ 3.47
    assert np.isfinite(ce).all()
    assert ce[0] > uniform * 0.5, f"CE started degenerate: {ce[0]}"
    # measured 3.35 -> 2.09 over 100 steps; gate well outside noise but
    # inside that trajectory
    assert ce[-1] < min(ce[0] - 0.8, uniform - 1.0), \
        f"token CE did not descend: {ce[0]:.3f} -> {ce[-1]:.3f}"
