"""PoseVQ tokenizer training CLI.

Capabilities of ref `tokenization/train_poseVQ.py`: warmup + AdamW +
multi-step LR, noise curriculum, periodic eval with best-checkpoint
selection (joint+mesh recon score), resume.

Usage (real data):
  python -m cli.train_tokenizer --train-npz amass_train.npz \
      --val-npz amass_val.npz --smplh-model smplh.pkl --out-dir runs/tok

Smoke mode (synthetic poses + synthetic SMPL-H, tiny arch):
  python -m cli.train_tokenizer --synthetic --tiny --total-iters 50 \
      --platform cpu --out-dir /tmp/tok
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-npz", nargs="*", default=[])
    p.add_argument("--val-npz", nargs="*", default=[])
    p.add_argument("--smplh-model", default=None)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--total-iters", type=int, default=200_000)
    p.add_argument("--warmup-iters", type=int, default=2)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight-decay", type=float, default=1e-5)
    p.add_argument("--eval-iters", type=int, default=2500)
    p.add_argument("--print-iters", type=int, default=100)
    p.add_argument("--add-noise", action="store_true", default=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true",
                   help="restore the latest checkpoint, run the eval pass "
                        "and dump eval_results.json (ref train_poseVQ.py "
                        "eval mode / eval_poseVQ.py results pkl)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--quantizer", default="ema_reset",
                   choices=["ema_reset", "ema", "reset", "orig"],
                   help="codebook update rule (ref ARCH.QUANTIZER, "
                        "option_posevq.py; release uses ema_reset)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)
    from tokenhmr_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tokenhmr_tpu.data.pose_dataset import (
        PoseDataset, eval_pose_batches, pose_batches,
    )
    from tokenhmr_tpu.models import posevq as PQ
    from tokenhmr_tpu.models import smpl as S
    from tokenhmr_tpu.models.posevq import add_noise_curriculum
    from tokenhmr_tpu.ops.rotations import (
        axis_angle_to_matrix, matrix_to_rotation_6d, rotation_6d_to_matrix,
    )
    from tokenhmr_tpu.train.checkpoint import CheckpointManager
    from tokenhmr_tpu.train.tokenizer import (
        TokenizerLossConfig, compute_vertex_area_weights,
        make_tokenizer_eval_step, make_tokenizer_optimizer,
        make_tokenizer_train_step,
    )

    # --- model / data ----------------------------------------------------
    if args.tiny:
        cfg = PQ.PoseVQConfig(code_dim=32, nb_code=64, width=64, depth=1,
                              quantizer=args.quantizer)
    else:
        cfg = PQ.PoseVQConfig(quantizer=args.quantizer)
    if args.smplh_model:
        smplh = S.load_smpl_model(args.smplh_model)
    elif args.tiny:
        smplh = S.synthetic_smpl_model(num_vertices=400, num_joints=52)
    else:
        # humanoid geometry: the area-weighted mesh loss then measures a
        # real body surface, and the codebook trains on the same prior the
        # synth-render TokenHMR stage samples (data/synth_crops.py)
        from tokenhmr_tpu.models.humanoid import humanoid_smplh_model

        smplh = humanoid_smplh_model(num_vertices=6890)

    if args.synthetic:
        from tokenhmr_tpu.data.synth_crops import sample_pose

        # jit the sampler: eager per-batch sampling is dozens of small
        # dispatches — seconds per batch over a remote-compile tunnel
        @jax.jit
        def _sample21(key):
            return sample_pose(key, args.batch_size)["body_pose"][:, :21]

        def synth_batches(seed):
            # physiological per-joint prior (same as synth-render crops);
            # body joints 1..21 of the 23-joint SMPL body pose
            k = 0
            while True:
                yield _sample21(jax.random.PRNGKey(seed + k))
                k += 1
        train_iter = synth_batches(100)
        val_batches = [next(synth_batches(999))]
    else:
        train_ds = PoseDataset(args.train_npz)
        val_ds = PoseDataset(args.val_npz) if args.val_npz else train_ds
        train_iter = pose_batches(train_ds, args.batch_size)
        val_batches = list(eval_pose_batches(val_ds, args.batch_size))[:20]

    loss_cfg = TokenizerLossConfig()
    vw = compute_vertex_area_weights(smplh) if loss_cfg.mesh_loss == "wt_l2" else None
    optimizer = make_tokenizer_optimizer(
        lr=args.lr, weight_decay=args.weight_decay,
        warmup_iters=args.warmup_iters,
        milestones=(int(args.total_iters * 0.75),),
    )

    model = PQ.PoseVQ(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 21, 6)))
    if args.quantizer == "orig":
        # trainable codebook rides the param tree (gradients + weight decay)
        params = dict(params)
        params["codebook"] = PQ.init_learned_codebook(jax.random.PRNGKey(1), cfg)
    opt_state = optimizer.init(params)
    vq_state = PQ.vq_init_state(cfg)

    ckpt = CheckpointManager(args.out_dir)
    start_iter = 0
    if args.eval_only:
        step = ckpt.latest_step()
        if step is not None:
            state = ckpt.restore({"params": params, "opt_state": opt_state,
                                  "vq_state": vq_state})
            params, vq_state = state["params"], state["vq_state"]
            print(f"eval-only: restored step {step}")
        eval_step = jax.jit(make_tokenizer_eval_step(cfg, smplh))
        agg = {}
        for vb in val_batches:
            em = eval_step(params, vq_state, jnp.asarray(vb),
                           jax.random.PRNGKey(0))
            for k, v in em.items():
                agg.setdefault(k, []).append(float(v))
        agg = {k: float(np.mean(v)) for k, v in agg.items()}
        agg["score"] = agg["jnt_err"] + agg["mesh_err"]
        agg["step"] = step or 0
        print(f"eval: {agg}", flush=True)
        import json
        with open(os.path.join(args.out_dir, "eval_results.json"), "w") as f:
            json.dump(agg, f, indent=2)
        return
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore({"params": params, "opt_state": opt_state,
                              "vq_state": vq_state})
        params, opt_state, vq_state = (state["params"], state["opt_state"],
                                       state["vq_state"])
        start_iter = ckpt.latest_step()
        print(f"resumed at iter {start_iter}")

    train_step = jax.jit(make_tokenizer_train_step(
        cfg, smplh, optimizer, loss_cfg, vw))
    eval_step = jax.jit(make_tokenizer_eval_step(cfg, smplh))

    @functools.partial(jax.jit, static_argnums=2)
    def _noise_in(rm, rng, step):
        return rotation_6d_to_matrix(
            add_noise_curriculum(matrix_to_rotation_6d(rm), rng, step=step))

    best_score = float("inf")
    t0 = time.time()
    for it in range(start_iter, args.total_iters):
        gt_rotmat = jnp.asarray(next(train_iter))
        rng = jax.random.PRNGKey(it)
        if args.add_noise:
            # noise applies to the 6D rep fed to the encoder; we mirror by
            # noising rotmats' 6D projection inside the step input (jitted:
            # the curriculum step is bucketed so it re-traces every 5000)
            gt_rotmat_in = _noise_in(gt_rotmat, rng, (it // 5000) * 5000)
        else:
            gt_rotmat_in = gt_rotmat
        params, opt_state, vq_state, metrics = train_step(
            params, opt_state, vq_state, gt_rotmat_in, rng
        )
        if it % args.print_iters == 0:
            m = {k: round(float(v), 5) for k, v in metrics.items()}
            rate = (it - start_iter + 1) * args.batch_size / (time.time() - t0)
            print(f"iter {it}: {m} ({rate:.0f} poses/s)", flush=True)
        if (it + 1) % args.eval_iters == 0 or it + 1 == args.total_iters:
            agg = {}
            for vb in val_batches:
                em = eval_step(params, vq_state, jnp.asarray(vb),
                               jax.random.PRNGKey(0))
                for k, v in em.items():
                    agg.setdefault(k, []).append(float(v))
            agg = {k: float(np.mean(v)) for k, v in agg.items()}
            score = agg["jnt_err"] + agg["mesh_err"]
            print(f"eval @ {it + 1}: {agg} score={score:.2f}", flush=True)
            ckpt.save(it + 1, {"params": params, "opt_state": opt_state,
                               "vq_state": vq_state}, config=cfg)
            if score < best_score:
                best_score = score
                with open(os.path.join(args.out_dir, "best.json"), "w") as f:
                    import json
                    json.dump({"step": it + 1, "score": score, **agg}, f)
    print(f"done; best score {best_score:.2f}")


if __name__ == "__main__":
    main()
