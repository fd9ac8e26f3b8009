"""Training-step throughput benchmark: flagship ViT-H TokenHMR train step.

Measures jitted train-step crops/s on one chip at the reference's release
batch size (48) and the full loss recipe (TALS loose supervision + token CE
with in-step frozen-encoder GT tokens, remat'd backbone backward).

Reference yardstick (BASELINE.md): the release checkpoint trained 350k
steps x batch 48 in ~4 days on 4x A100 DDP fp16
(/root/reference/README.md:305, configs_hydra/experiment/
tokenhmr_release.yaml).  Lightning DDP gives EACH of the 4 processes its
own DataLoader at TRAIN.BATCH_SIZE=48 (ref lib/datasets/__init__.py:82),
so a "step" consumes 4x48 crops: 350k steps / 4 days = 48.6 crops/s per
GPU, ~194.4 aggregate.

Prints one JSON line:
  {"metric": "train_crops_per_sec_chip", "value": N, ...,
   "ref_crops_per_sec_gpu": 48.6, "vs_ref_gpu": N/48.6}

Usage: python scripts/train_bench.py [--batch 48] [--iters 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Per-GPU rate: each DDP process steps its OWN batch-48 loader, so the
# per-GPU crop rate is steps/s * 48 with steps/s = 350k / 4 days.
REF_CROPS_PER_SEC_GPU = 350_000 * 48 / (4 * 86400)       # 48.6
REF_CROPS_PER_SEC_AGGREGATE = REF_CROPS_PER_SEC_GPU * 4  # 194.4 (4x A100)


def synthetic_device_batch(batch_size, img_hw, seed=0):
    from tokenhmr_tpu.ops.rotations import axis_angle_to_matrix

    rng = np.random.RandomState(seed)
    H, W = img_hw
    B = batch_size
    aa = rng.randn(B, 24, 3).astype(np.float32) * 0.2
    rm = axis_angle_to_matrix(jnp.asarray(aa))
    batch = {
        "img": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "keypoints_2d": jnp.asarray(rng.rand(B, 44, 3), jnp.float32),
        "keypoints_3d": jnp.asarray(rng.rand(B, 44, 4), jnp.float32),
        "smpl_params": {
            "global_orient": rm[:, :1],
            "body_pose": rm[:, 1:],
            "betas": jnp.asarray(rng.randn(B, 10) * 0.5, jnp.float32),
        },
        "has_smpl_params": {
            "global_orient": jnp.ones(B, jnp.float32),
            "body_pose": jnp.ones(B, jnp.float32),
            "betas": jnp.ones(B, jnp.float32),
        },
        "valid_3d": jnp.ones(B, jnp.float32),
    }
    return batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from tokenhmr_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    import dataclasses as dc

    import __graft_entry__ as G
    from tokenhmr_tpu.train.train_step import make_optimizer, make_train_step
    from tokenhmr_tpu.utils.configs import RELEASE_LOSS_WEIGHTS

    cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=1,
                                                     tiny=args.tiny)
    if not args.tiny:
        # same memory trade as cli/train.py: remat the 32 scanned blocks so
        # the (B,192,5120) MLP hiddens are recomputed, not saved (B=48
        # without remat needs ~35 GB vs the v5e's 16)
        cfg = dc.replace(cfg, vit=dc.replace(cfg.vit, remat=True))

    opt = make_optimizer(lr=1e-5)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_train_step(
        cfg, smpl_model, frozen, opt,
        loss_weights=dict(RELEASE_LOSS_WEIGHTS),
        loose_sup=True, token_loss_weight=0.0005, compute_gt_tokens=True))

    batch = synthetic_device_batch(args.batch, cfg.vit.img_size)
    rng = jax.random.PRNGKey(0)

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}, batch {args.batch}, "
          f"remat={cfg.vit.remat}", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(args.warmup):
        params, opt_state, metrics = step_fn(params, opt_state, batch,
                                             jax.random.fold_in(rng, i))
    # block_until_ready can return early on the tunneled backend; a value
    # readback is the reliable barrier (docs/PERF_NOTES.md)
    if args.warmup:
        float(metrics["total"])
    print(f"# warmup+compile: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(args.iters):
        params, opt_state, metrics = step_fn(
            params, opt_state, batch, jax.random.fold_in(rng, 100 + i))
    last_loss = float(metrics["total"])
    dt = time.perf_counter() - t0

    steps_per_sec = args.iters / dt
    crops_per_sec = steps_per_sec * args.batch
    out = {
        "metric": "train_crops_per_sec_chip",
        "value": round(crops_per_sec, 1),
        "unit": "train crops/sec/chip",
        "steps_per_sec": round(steps_per_sec, 3),
        "batch": args.batch,
        "ref_crops_per_sec_gpu": round(REF_CROPS_PER_SEC_GPU, 2),
        "ref_crops_per_sec_aggregate": round(REF_CROPS_PER_SEC_AGGREGATE, 2),
        "vs_ref_gpu": round(crops_per_sec / REF_CROPS_PER_SEC_GPU, 2),
        "loss_finite": bool(np.isfinite(last_loss)),
        "device": dev.device_kind,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
