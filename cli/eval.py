"""Benchmark evaluation CLI (3DPW / EMDB / H36M).

Capabilities of ref `tokenhmr/eval.py`: per-dataset eval loop, Evaluator
accumulation (MPJPE / PA-MPJPE / PVE), CSV result appending.

Usage:
  python -m cli.eval --dataset 3DPW-TEST --dataset-dir /data \
      --checkpoint ckpt_dir [--synthetic-weights] [--batch-size 64]

With --synthetic-weights the model runs with random weights (pipeline
smoke-testing without the registration-gated released checkpoints).
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def save_eval_result(csv_path, metric_dict, checkpoint_path, dataset_name,
                     error=None, iters_done=None, exp_name=None):
    """CSV append (ref eval.py:162-201, pandas-free)."""
    exists = os.path.exists(csv_path)
    ts = datetime.now().isoformat()
    exp_name = exp_name or os.path.basename(os.path.dirname(str(checkpoint_path)))
    with open(csv_path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(["timestamp", "checkpoint_path", "exp_name", "dataset",
                        "metric_name", "metric_value", "error", "iters_done"])
        for name, value in metric_dict.items():
            w.writerow([ts, checkpoint_path, exp_name, dataset_name, name,
                        f"{value:.2f}", error, iters_done])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="3DPW-TEST",
                   help="comma list of datasets (3DPW-TEST, EMDB, ...)")
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--params-npz", default=None,
                   help="in-framework trained export (cli/train.py "
                        "--export-params) as an alternative to --checkpoint")
    p.add_argument("--tokenizer-checkpoint", default=None)
    p.add_argument("--smpl-model", default=None, help="SMPL neutral .pkl/.npz")
    p.add_argument("--smpl-model-male", default=None)
    p.add_argument("--smpl-model-female", default=None)
    p.add_argument("--joint-regressor-extra", default=None)
    p.add_argument("--results-file", default="eval_results.csv")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--log-freq", type=int, default=10)
    p.add_argument("--exp-name", default=None)
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--render-dir", default=None,
                   help="save prediction grids every --log-freq batches "
                        "(ref eval.py --render)")
    p.add_argument("--synthetic-weights", action="store_true",
                   help="random weights + synthetic SMPL (pipeline smoke test)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (CI smoke test; implies synthetic)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (the env's TPU plugin ignores "
                        "JAX_PLATFORMS; this flag uses jax.config)")
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="W8A8 int8 ViT inference (speed knob; measure the "
                        "metric delta it costs on this benchmark).  The "
                        "first batch calibrates static per-channel scales "
                        "(SmoothQuant-style fc1->fc2 fold + pre-quantized "
                        "weights), enabling the fused TPU kernels")
    p.add_argument("--merge", default=None, metavar="SCHED",
                   help="ToMe token merging, e.g. '8:32,16:32,24:32' "
                        "(speed knob; measure the metric delta here)")
    p.add_argument("--n-devices", type=int, default=1,
                   help="data-parallel inference over the first N devices "
                        "(params replicated, batch sharded; SPMD NamedSharding "
                        "— the Lightning-DDP eval equivalent, ref eval.py via "
                        "pytorch DataLoader/cuda)")
    args = p.parse_args(argv)
    from tokenhmr_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tokenhmr_tpu.data.npz_dataset import (
        DataLoader, GTVertexComputer, NpzDataset, NpzDatasetConfig,
    )
    from tokenhmr_tpu.models import smpl as S
    from tokenhmr_tpu.models.tokenhmr import forward_step
    from tokenhmr_tpu.utils.configs import EVAL_DATASETS
    from tokenhmr_tpu.utils.evaluator import Evaluator

    # --- model assembly ---------------------------------------------------
    mean_params = None
    if args.params_npz:
        # in-framework trained export (cli/train.py --export-params);
        # GT meshes come from the same humanoid body model it trained on
        import __graft_entry__ as G
        from tokenhmr_tpu.train.checkpoint import load_params_npz

        cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=1)
        trees, _ = load_params_npz(args.params_npz)
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        params = as_jnp(trees["params"])
        frozen = {"params": as_jnp(trees["frozen_params"]),
                  "vq_state": frozen["vq_state"]._replace(
                      codebook=jnp.asarray(trees["codebook"]["codebook"]))}
        male = female = smpl_model
        print(f"loaded trained params from {args.params_npz}")
    elif args.synthetic_weights or args.tiny:
        import __graft_entry__ as G

        cfg, frozen, smpl_model, params, _ = G._flagship(
            batch_size=1, tiny=args.tiny
        )
        male = female = smpl_model
    else:
        from tokenhmr_tpu.convert.load import load_tokenhmr_checkpoint

        cfg, params, frozen, mean_params = load_tokenhmr_checkpoint(
            args.checkpoint, tokenizer_path=args.tokenizer_checkpoint
        )
        smpl_model = S.load_smpl_model(
            args.smpl_model, joint_regressor_extra=args.joint_regressor_extra
        )
        male = S.load_smpl_model(args.smpl_model_male or args.smpl_model)
        female = S.load_smpl_model(args.smpl_model_female or args.smpl_model)

    gt_verts = GTVertexComputer(male, female)
    J24 = np.asarray(smpl_model.J_regressor)[:24]

    import dataclasses as dc
    import functools

    if args.quant:
        cfg = dc.replace(cfg, vit=dc.replace(cfg.vit, quant=args.quant))
    if args.merge:
        sched = tuple(tuple(int(v) for v in part.split(":"))
                      for part in args.merge.split(","))
        cfg = dc.replace(cfg, vit=dc.replace(cfg.vit, merge_schedule=sched))

    batch_shd = None
    if args.n_devices > 1:
        # data-parallel SPMD eval: one jitted program over a data-only
        # mesh; XLA splits every batch-leading tensor across devices and
        # runs the same bytes on each, no collectives needed in forward
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        assert len(devs) >= args.n_devices, (
            f"--n-devices {args.n_devices} > visible {len(devs)}; on CPU "
            f"set xla_force_host_platform_device_count (tests/conftest.py)")
        assert args.batch_size % args.n_devices == 0, (
            "--batch-size must divide evenly across --n-devices")
        mesh = Mesh(np.array(devs[:args.n_devices]), ("data",))
        batch_shd = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), params)
        frozen = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
            frozen)

    @functools.partial(jax.jit, static_argnames=("use_hips",))
    def model_forward(params, img, use_hips=False):
        c = dc.replace(cfg, update_hips=use_hips) if use_hips else cfg
        return forward_step(params, frozen, c, smpl_model, img,
                            mean_params=mean_params)

    for dataset_name in args.dataset.split(","):
        ds_cfg = EVAL_DATASETS[dataset_name]
        dataset = NpzDataset(NpzDatasetConfig(
            dataset_file=os.path.join(args.dataset_dir, ds_cfg["dataset_file"]),
            img_dir=os.path.join(args.dataset_dir, ds_cfg["img_dir"]),
            dataset_name=dataset_name,
            train=False,
            img_size=max(cfg.vit.img_size),
        ))
        loader = DataLoader(dataset, args.batch_size,
                            num_workers=args.num_workers)
        evaluator = Evaluator(
            dataset_length=len(dataset),
            keypoint_list=ds_cfg["keypoint_list"],
            pelvis_ind=ds_cfg.get("pelvis_ind", 39),
            J_regressor_24=J24,
            dataset=dataset_name,
        )
        t0 = time.time()
        n_batches = 0
        for i, batch in enumerate(loader):
            batch = gt_verts(batch)
            img = np.asarray(batch["img"])
            use_hips = ds_cfg.get("use_hips", False)
            if args.quant and i == 0 and "backbone_quant" not in params:
                # calibrate static quant scales + pre-quantized weights on
                # the first real batch (same pass bench.py runs)
                from tokenhmr_tpu.models.vit import ViT
                ccfg = dc.replace(cfg.vit, quant="calib")

                @jax.jit
                def calib(p, im):
                    return ViT(ccfg).apply({"params": p["backbone"]}, im,
                                           mutable=["quant"])[1]["quant"]
                params = dict(params)
                params["backbone_quant"] = calib(params, jnp.asarray(img))
            if batch_shd is None:
                out = model_forward(params, jnp.asarray(img), use_hips=use_hips)
            else:
                n = img.shape[0]
                pad = (-n) % args.n_devices
                if pad:  # ragged tail: repeat the last crop, slice after
                    img = np.concatenate([img, np.repeat(img[-1:], pad, 0)])
                out = model_forward(params, jax.device_put(img, batch_shd),
                                    use_hips=use_hips)
                if pad:
                    out = jax.tree_util.tree_map(lambda v: v[:n], out)
            evaluator(out, batch)
            n_batches = i + 1
            if i % args.log_freq == args.log_freq - 1:
                print(evaluator.log(), flush=True)
                if args.render_dir:
                    import cv2

                    from tokenhmr_tpu.utils.viz_grid import visualize_batch_grid

                    os.makedirs(args.render_dir, exist_ok=True)
                    grid = visualize_batch_grid(
                        batch, {k: np.asarray(v) for k, v in out.items()
                                if hasattr(v, "shape")},
                        smpl_model.faces, num_images=4)
                    cv2.imwrite(os.path.join(
                        args.render_dir, f"render_{dataset_name}_{i}.png"),
                        grid[:, :, ::-1])
            if args.max_batches and n_batches >= args.max_batches:
                break
        dt = time.time() - t0
        print(evaluator.log())
        print(f"[{dataset_name}] {evaluator.counter} samples in {dt:.1f}s "
              f"({evaluator.counter / dt:.1f} crops/s)")
        save_eval_result(
            args.results_file, evaluator.get_metrics_dict(),
            args.checkpoint or "synthetic", dataset_name,
            iters_done=n_batches, exp_name=args.exp_name,
        )


if __name__ == "__main__":
    main()
