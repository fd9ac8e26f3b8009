"""End-to-end throughput benchmark: 256x192 crops -> SMPL vertices.

Runs the flagship TokenHMR forward (ViT-H + token head + frozen PoseVQ
decode + SMPL LBS + projection) as one jitted program on the available
accelerator and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "crops/sec/chip", "vs_baseline": N}

Baseline: BASELINE.json north-star = 2000 crops/sec/chip on TPU v5e.
The input is uint8 pixels; normalization happens on-device inside the jit
(part of the measured path, as the metric demands pixels->vertices).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: ViT-H compiles are expensive (especially via
# remote-compile tunnels); cache them across bench invocations
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_CROPS_PER_SEC = 2000.0
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def main():
    import __graft_entry__ as G
    from tokenhmr_tpu.models.tokenhmr import forward_step

    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=batch_size)
    trained = False
    ckpt_path = os.environ.get(
        "BENCH_CKPT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "artifacts_synth", "flagship_final.npz"))
    if ckpt_path and not os.path.exists(ckpt_path):
        # the npz export is gitignored (2.6 GB) but always regenerable from
        # the committed orbax run dir (scripts/export_params.py).  Never
        # silently bench random weights (VERDICT r4 weak #1): rebuild the
        # export from the newest committed flagship run before falling back.
        root = os.path.dirname(os.path.abspath(__file__))
        run_dir = os.environ.get(
            "BENCH_RUN_DIR", os.path.join(root, "artifacts_synth", "run_r4b"))
        tok_dir = os.path.join(root, "artifacts_synth", "tok_r4")
        if os.path.isdir(run_dir):
            import subprocess
            out = (ckpt_path if not os.path.islink(ckpt_path)
                   else os.path.realpath(ckpt_path))
            print(f"# {ckpt_path} missing; regenerating from {run_dir}",
                  file=sys.stderr)
            cmd = [sys.executable, os.path.join(root, "scripts",
                                                "export_params.py"),
                   "--run-dir", run_dir, "--out", out]
            if os.path.isdir(tok_dir):
                cmd += ["--tokenizer-run-dir", tok_dir]
            r = subprocess.run(cmd)
            if r.returncode != 0:
                print("# export_params FAILED; benching random weights",
                      file=sys.stderr)
            elif out != ckpt_path and not os.path.exists(ckpt_path):
                os.symlink(os.path.basename(out), ckpt_path)
    if ckpt_path and os.path.exists(ckpt_path):
        # trained weights (synthetic-data run, cli/train.py --synth-render
        # --export-params): delta_mm below is then a TRAINED-weight number,
        # not the chaos-amplified random-weight one
        from tokenhmr_tpu.train.checkpoint import load_params_npz
        trees, _cfgd = load_params_npz(ckpt_path)
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        if os.environ.get("BENCH_BF16_PARAMS", "1") == "1":
            # cast on the HOST before transfer: halves the bytes shipped
            # over the TPU tunnel (2.8 GB -> 1.4 GB) and skips the dead
            # fp32 device copy (the bf16 cast below then no-ops)
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(
                    x.astype(jnp.bfloat16)
                    if x.dtype in (np.float32, np.float64) else x),
                trees["params"])
        else:
            params = as_jnp(trees["params"])
        frozen = {
            "params": as_jnp(trees["frozen_params"]),
            "vq_state": frozen["vq_state"]._replace(
                codebook=jnp.asarray(trees["codebook"]["codebook"])),
        }
        trained = True
        print(f"# loaded trained weights from {ckpt_path}", file=sys.stderr)
    quant = os.environ.get("BENCH_QUANT", "int8")
    if quant == "int8":
        # W8A8 dynamic-quant MXU path for the ViT dense layers: measured
        # 1.5-1.7x over bf16 per-matmul on v5e (docs/PERF_NOTES.md); output
        # accuracy delta vs bf16 is printed by BENCH_CHECK=1
        import dataclasses
        cfg = dataclasses.replace(cfg, vit=dataclasses.replace(cfg.vit, quant="int8"))
    if os.environ.get("BENCH_HEAD_BF16", "1") == "1":
        # the head's decoder cross-attn projections are ~4 ms/step in f32
        # (head is <2% of model FLOPs; bf16 noise is negligible there)
        import dataclasses
        # BENCH_HEAD_QUANT=1 runs the decoder kv projection in int8 too:
        # measured a net LOSS with token merging (1156 vs 1260 at the
        # 4:32,... schedule) — per-layer dynamic quant of the small merged
        # context costs more than the matmul saves.  Off by default.
        dec_quant = (quant if os.environ.get("BENCH_HEAD_QUANT", "0") == "1"
                     and quant == "int8" else None)
        head = dataclasses.replace(
            cfg.head, dtype=jnp.bfloat16,
            decoder=dataclasses.replace(cfg.head.decoder, dtype=jnp.bfloat16,
                                        quant=dec_quant))
        cfg = dataclasses.replace(cfg, head=head)
    # ToMe token merging (ops/merge.py): "block:r,..." = merge r tokens
    # before each listed block (keys metric).  The default is the 5-site
    # schedule chosen from the TRAINED-WEIGHT operating-point table
    # (docs/ACC_TABLE.md, scripts/acc_table.py + scripts/sweep.py, round
    # 3): measured on the in-framework-trained flagship, its vertex delta
    # vs the exact bf16 graph is 8.2 mm with task metrics (PVE/MPJPE/
    # PA-MPJPE) moving <0.25 mm — well under eval noise.  Trained-weight
    # speed/accuracy ladder on v5e (crops/s, delta): off 1077/1.2mm,
    # 6:32,12:32,18:32,24:32 1489/3.1mm, 4:64,10:48,16:32,22:16
    # 2139/5.0mm, default 2290/8.2mm.  BENCH_MERGE=off for the exact
    # reference graph; the exact-graph throughput is also printed in the
    # same run (exact_bf16_crops_per_sec) so the knob is never hidden.
    merge = os.environ.get("BENCH_MERGE", "2:80,8:48,14:24,18:16,24:8")
    if merge.lower() in ("off", "none", "0"):
        merge = ""
    if merge:
        import dataclasses
        sched = tuple(
            tuple(int(v) for v in part.split(":")) for part in merge.split(",")
        )
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(
                cfg.vit, merge_schedule=sched,
                merge_metric=os.environ.get("BENCH_MERGE_METRIC", "keys")))
    unroll = int(os.environ.get("BENCH_SCAN_UNROLL", "1"))
    if unroll != 1:
        # unroll the block scan to amortize the (B, S, C) carry
        # double-buffer copy (~2.5 ms/step at B=128, docs/PERF_NOTES.md)
        import dataclasses
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, scan_unroll=unroll))
    attn = os.environ.get("BENCH_ATTN", "")
    if attn:
        # A/B the attention implementation (auto|pallas|xla); with token
        # merging the small-S tradeoff can differ from the S=192 measurement
        import dataclasses
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, attn_impl=attn))
    if os.environ.get("BENCH_BF16_PARAMS", "1") == "1":
        # store weights in bf16: halves weight HBM traffic, removes the
        # per-layer f32->bf16 cast; accuracy impact is within bf16 compute
        # noise since activations are already bf16
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    mean = jnp.asarray(MEAN)
    std = jnp.asarray(STD)

    @jax.jit
    def pixels_to_vertices(params, crops_u8):
        x = crops_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        out = forward_step(params, frozen, cfg, smpl_model, x)
        return out["pred_vertices"], out["pred_cam_t"]

    if trained:
        # realistic inputs for the numeric-health check: the same
        # synthetic-render distribution the weights were trained on
        # (noise inputs would drive a trained model to its mean pose and
        # understate quant/merge deltas)
        from tokenhmr_tpu.data.synth_crops import (SynthConfig,
                                                   make_synth_batch_fn)
        gen = jax.jit(make_synth_batch_fn(
            smpl_model, SynthConfig(normalize=False)), static_argnums=1)
        img = gen(jax.random.PRNGKey(42_000_000), batch_size)["img"]
        crops = jnp.asarray(
            (np.asarray(img) * 255).clip(0, 255).astype(np.uint8))
    else:
        rng = np.random.RandomState(0)
        crops = jnp.asarray(
            rng.randint(0, 255, (batch_size, 256, 192, 3), dtype=np.uint8)
        )

    if quant == "int8" and os.environ.get("BENCH_STATIC_QUANT", "1") == "1":
        # one calibration forward (bf16) records per-channel fc1-output
        # maxima; the static scales let XLA fuse fc1's output quantization
        # into its matmul epilogue (saves a full (B,S,4C) HBM round trip
        # per layer)
        import dataclasses
        from tokenhmr_tpu.models.vit import ViT
        ccfg = dataclasses.replace(cfg.vit, quant="calib")

        @jax.jit
        def calib(params, crops_u8):
            x = crops_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            return ViT(ccfg).apply({"params": params["backbone"]}, x,
                                   mutable=["quant"])[1]["quant"]

        params = dict(params)
        # headroom over the calibration batch is applied inside the calib
        # pass itself (ViTMlp), so the fc2 weight fold and the fc1 output
        # scales stay consistent; the collection also carries pre-quantized
        # weights (w_q/w_s), skipping the per-step quantize_cols pass
        params["backbone_quant"] = calib(params, crops)

    # warmup/compile (value readback forces a REAL sync; block_until_ready
    # has been observed returning early on tunneled PJRT backends)
    try:
        for _ in range(warmup):
            v, c = pixels_to_vertices(params, crops)
        float(jnp.sum(v))
    except jax.errors.JaxRuntimeError as e:
        # ONLY compile/runtime errors from XLA (scoped-VMEM OOM on
        # borderline pallas tiles in rare fusion contexts,
        # docs/PERF_NOTES.md round 2) fall back to the exact graph; any
        # other exception (a real bug in the merged/fused path) propagates
        # so regressions are loud.  BENCH_FALLBACK=0 disables even this.
        if not merge or os.environ.get("BENCH_FALLBACK", "1") != "1":
            raise
        print(f"# merge schedule failed to compile ({type(e).__name__}); "
              f"falling back to exact graph", file=sys.stderr)
        merge = ""
        import dataclasses
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, merge_schedule=()))

        @jax.jit
        def pixels_to_vertices(params, crops_u8):
            x = crops_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            out = forward_step(params, frozen, cfg, smpl_model, x)
            return out["pred_vertices"], out["pred_cam_t"]

        for _ in range(warmup):
            v, c = pixels_to_vertices(params, crops)
        float(jnp.sum(v))

    delta_mm = delta_p99_mm = None
    exact_crops_per_sec = None
    if os.environ.get("BENCH_CHECK", "1") == "1":
        # numeric health, default ON (asserted below): vertex-space delta
        # of the benched config vs the exact bf16 reference graph (no
        # quant, no merging) on the SAME batch — a kernel regression on
        # real hardware shifts this and fails the bench instead of
        # silently shifting accuracy.  NOTE: with the driver's synthetic
        # random weights this delta is chaos-amplified (32 random residual
        # blocks; docs/PERF_NOTES.md); the schedule-choice accuracy
        # evidence lives in the trained-weight table in PERF_NOTES, not
        # here.
        import dataclasses
        bcfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, quant=None,
                                         merge_schedule=()))

        @jax.jit
        def ref_fn(params, crops_u8):
            x = crops_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            out = forward_step(params, frozen, bcfg, smpl_model, x)
            return out["pred_vertices"]

        v_ref = ref_fn(params, crops)
        dv = jnp.linalg.norm(v - v_ref, axis=-1)  # (B, V) in meters
        delta_mm = float(jnp.mean(dv)) * 1000
        delta_p99_mm = float(jnp.percentile(dv, 99)) * 1000
        tag = f"quant={quant} merge={merge or 'off'}"
        print(f"# [{tag}] vs exact-bf16 vertex delta: "
              f"mean {delta_mm:.3f} mm, p99 {delta_p99_mm:.3f} mm",
              file=sys.stderr)
        assert np.isfinite(delta_mm), "non-finite output from benched graph"
        # trained weights: tight bound (kernel regressions show up as mm).
        # random synthetic weights (no artifacts_synth ckpt present): the
        # same graph delta is chaos-amplified ~20x by 32 random residual
        # blocks (measured 41 mm at the 4-site schedule, ~150 mm at the
        # 5-site, vs 2.9/8.1 mm trained — docs/ACC_TABLE.md), so the
        # assert only guards against NaN/blowup, not accuracy.
        default_bound = "120" if trained else "400"
        if not trained:
            # Loud flag (ADVICE r3): without the trained ckpt (e.g. the
            # gitignored npz lost on a reset) this run's delta assert is
            # only a NaN/blowup guard, NOT accuracy evidence — make that
            # impossible to mistake for an accuracy-verified result.
            print("# WARNING: trained checkpoint NOT found — running on "
                  "RANDOM weights; delta bound relaxed to 400 mm and the "
                  "accuracy gate is NOT exercised (see weights= tag and "
                  "accuracy_gated=false in the JSON)", file=sys.stderr)
        bound = float(os.environ.get("BENCH_DELTA_MAX", default_bound))
        assert delta_mm < bound, (
            f"vertex delta {delta_mm:.1f} mm exceeds BENCH_DELTA_MAX={bound}"
            " — kernel numeric regression")

        if os.environ.get("BENCH_SECONDARY", "1") == "1":
            # secondary metric in the same run (ADVICE r2): throughput of
            # the EXACT reference graph (bf16, no merge/quant), so the
            # headline never hides the speed/accuracy knob
            ref_iters = max(4, iters // 4)
            v_ref = ref_fn(params, crops)
            float(jnp.sum(v_ref))
            t0 = time.perf_counter()
            for _ in range(ref_iters):
                v_ref = ref_fn(params, crops)
            float(jnp.sum(v_ref))
            exact_crops_per_sec = round(
                batch_size * ref_iters / (time.perf_counter() - t0), 2)

    t0 = time.perf_counter()
    for _ in range(iters):
        v, c = pixels_to_vertices(params, crops)
    float(jnp.sum(v))
    dt = time.perf_counter() - t0

    crops_per_sec = batch_size * iters / dt
    rec = {
        "metric": "e2e_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 2),
        "unit": "256x192 crops/sec/chip (pixels->SMPL vertices)",
        "vs_baseline": round(crops_per_sec / BASELINE_CROPS_PER_SEC, 4),
        "config": (f"quant={quant} merge={merge or 'off'} B={batch_size} "
                   f"weights={'trained-synth' if trained else 'random'}"),
    }
    # accuracy_gated: True only when the delta assert ran against TRAINED
    # weights with the tight bound — i.e. the number is accuracy evidence,
    # not just a NaN guard (ADVICE r3).
    rec["accuracy_gated"] = bool(trained and delta_mm is not None)
    if delta_mm is not None:
        rec["delta_mm"] = round(delta_mm, 3)
        rec["delta_p99_mm"] = round(delta_p99_mm, 3)
    if exact_crops_per_sec is not None:
        rec["exact_bf16_crops_per_sec"] = exact_crops_per_sec
    print(json.dumps(rec))


def _wait_for_backend():
    """Bounded wait for the TPU backend before benching.

    The driver runs this bench unattended at round end; a transiently-down
    TPU tunnel otherwise either hangs the process indefinitely (stuck
    tunnel) or fails the whole round's BENCH with an Unavailable error.
    Probe in a SUBPROCESS (a stuck tunnel blocks inside C code — a thread
    watchdog can't interrupt it) and retry for up to ~15 min.
    """
    import subprocess
    attempts = int(os.environ.get("BENCH_BACKEND_ATTEMPTS", "6"))
    probe = ("import jax, jax.numpy as jnp;"
             "print(float(jnp.sum(jnp.ones((8, 8)))))")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=90, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"bench: TPU backend unavailable "
              f"(attempt {i + 1}/{attempts}); retrying in 60s",
              file=sys.stderr)
        time.sleep(60)
    # fall through: main() surfaces the real error


if __name__ == "__main__":
    if os.environ.get("BENCH_WAIT_BACKEND", "1") == "1":
        _wait_for_backend()
    main()
