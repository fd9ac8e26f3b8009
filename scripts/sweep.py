"""Single-process on-chip A/B sweep (replaces bench_sweep.sh).

bench.py re-transfers the 1.4 GB trained-weight tree per invocation,
which the tunneled TPU backend turns into ~10 min of dead time per
variant.  This sweep loads the weights ONCE and times every variant
in-process; THMR_ATTN_HOIST / THMR_FUSED_MLP are trace-time env reads,
so flipping os.environ before a fresh jax.jit re-traces with the flag.

Prints one labeled JSON line per variant (same timing methodology as
bench.py: warmup + value-readback sync, B=128).

Usage: python scripts/sweep.py [--iters 12] [--out /tmp/sweep.jsonl]
"""
import argparse
import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)

SCHED_DEFAULT = "6:32,12:32,18:32,24:32"

# label, merge schedule, env flags
VARIANTS = [
    ("default", SCHED_DEFAULT, {}),
    ("hoist", SCHED_DEFAULT, {"THMR_ATTN_HOIST": "1"}),
    ("fusedmlp", SCHED_DEFAULT, {"THMR_FUSED_MLP": "1"}),
    ("hoist+fusedmlp", SCHED_DEFAULT,
     {"THMR_ATTN_HOIST": "1", "THMR_FUSED_MLP": "1"}),
    ("sched-off", "", {}),
    ("sched-3site", "8:32,16:32,24:32", {}),
    ("sched-agg", "4:64,10:48,16:32,22:16", {}),
    ("sched-max", "4:80,10:48,16:24,20:16,26:8", {}),
    ("sched-max+hoist", "4:80,10:48,16:24,20:16,26:8",
     {"THMR_ATTN_HOIST": "1"}),
    ("sched-max+fusedmlp", "4:80,10:48,16:24,20:16,26:8",
     {"THMR_FUSED_MLP": "1"}),
    # adaptive hoist: per-segment VMEM plan keeps S=192 on the per-row
    # kernel (the real-v5e compile failure) and batches rows at S<=112
    ("hoist-auto", SCHED_DEFAULT, {"THMR_ATTN_HOIST": "auto"}),
    ("sched-max+hoistauto", "4:80,10:48,16:24,20:16,26:8",
     {"THMR_ATTN_HOIST": "auto"}),
    # proj+residual folded into the attention kernel (attn_block_q8);
    # only active on S<=160 segments, i.e. every post-merge segment
    ("fusedproj", SCHED_DEFAULT, {"THMR_FUSED_PROJ": "1"}),
    ("sched-max+fusedproj", "4:80,10:48,16:24,20:16,26:8",
     {"THMR_FUSED_PROJ": "1"}),
    # proj-fused block kernel AND cross-row hoist: S=192 per-row unfused,
    # S=112 per-row fused (proj plan over budget), S<=64 hoisted fused
    ("sched-max+fusedproj+hoistauto", "4:80,10:48,16:24,20:16,26:8",
     {"THMR_FUSED_PROJ": "1", "THMR_ATTN_HOIST": "auto"}),
    # first merge moved up to block 2: the S=192 prologue halves
    # (4 blocks -> 2), ~16% fewer block-tokens than sched-max overall;
    # accuracy gate = scripts/acc_table.py "5-site early" row
    ("sched-early", "2:80,8:48,14:24,18:16,24:8", {}),
    ("sched-early+fusedproj", "2:80,8:48,14:24,18:16,24:8",
     {"THMR_FUSED_PROJ": "1"}),
    ("sched-early+hoistauto", "2:80,8:48,14:24,18:16,24:8",
     {"THMR_ATTN_HOIST": "auto"}),
    # scan unroll: amortizes the (B,S,C) carry double-buffer copy
    # (~2.5 ms/step at B=128); cfg patch, not env (vit.scan_unroll)
    ("sched-early+unroll8", "2:80,8:48,14:24,18:16,24:8", {},
     {"scan_unroll": 8}),
    ("sched-early+hoistauto+unroll8", "2:80,8:48,14:24,18:16,24:8",
     {"THMR_ATTN_HOIST": "auto"}, {"scan_unroll": 8}),
    ("sched-max+unroll8", "4:80,10:48,16:24,20:16,26:8", {},
     {"scan_unroll": 8}),
    # exact-graph tail (VERDICT r3 #7): unroll + int8 decoder kv
    # projections, measured WITHOUT merging (head-quant was only ever
    # measured under merging, where it lost)
    ("sched-off+unroll4", "", {}, {"scan_unroll": 4}),
    ("sched-off+unroll8", "", {}, {"scan_unroll": 8}),
    ("sched-off+headquant", "", {}, {"head_quant": "int8"}),
    ("sched-off+headquant+unroll8", "", {},
     {"scan_unroll": 8, "head_quant": "int8"}),
]


def parse_sched(s):
    if not s:
        return ()
    return tuple(tuple(int(v) for v in p.split(":")) for p in s.split(","))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default="/tmp/sweep.jsonl")
    ap.add_argument("--only", default="",
                    help="comma-separated variant labels to run")
    args = ap.parse_args()

    import __graft_entry__ as G
    from tokenhmr_tpu.models.tokenhmr import forward_step
    from tokenhmr_tpu.models.vit import ViT
    from tokenhmr_tpu.train.checkpoint import load_params_npz

    cfg0, frozen, smpl_model, params, _ = G._flagship(batch_size=args.batch)
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts_synth", "flagship_final.npz")
    trained = os.path.exists(ckpt)
    if trained:
        trees, _ = load_params_npz(ckpt)
        as_bf16 = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                x.astype(jnp.bfloat16)
                if x.dtype in (np.float32, np.float64) else x), t)
        params = as_bf16(trees["params"])
        frozen = {"params": as_bf16(trees["frozen_params"]),
                  "vq_state": frozen["vq_state"]._replace(
                      codebook=jnp.asarray(trees["codebook"]["codebook"]))}
        print(f"# trained weights: {ckpt}", file=sys.stderr)
    else:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    # bf16 head/decoder like bench.py's default
    base = dc.replace(
        cfg0,
        vit=dc.replace(cfg0.vit, quant="int8", merge_metric="keys"),
        head=dc.replace(cfg0.head, dtype=jnp.bfloat16,
                        decoder=dc.replace(cfg0.head.decoder,
                                           dtype=jnp.bfloat16)))

    mean, std = jnp.asarray(MEAN), jnp.asarray(STD)

    if trained:
        from tokenhmr_tpu.data.synth_crops import (SynthConfig,
                                                   make_synth_batch_fn)
        gen = jax.jit(make_synth_batch_fn(
            smpl_model, SynthConfig(normalize=False)), static_argnums=1)
        img = gen(jax.random.PRNGKey(42_000_000), args.batch)["img"]
        crops = jnp.asarray(
            (np.asarray(img) * 255).clip(0, 255).astype(np.uint8))
    else:
        rng = np.random.RandomState(0)
        crops = jnp.asarray(rng.randint(
            0, 255, (args.batch, 256, 192, 3), dtype=np.uint8))

    # exact bf16 reference (for delta_mm)
    bcfg = dc.replace(base, vit=dc.replace(base.vit, quant=None,
                                           merge_schedule=()))

    @jax.jit
    def ref_fn(pp, crops_u8):
        x = (crops_u8.astype(jnp.float32) / 255.0 - mean) / std
        out = forward_step(pp, frozen, bcfg, smpl_model, x)
        return out["pred_vertices"]

    v_ref = ref_fn(params, crops)
    float(jnp.sum(v_ref))

    out_f = open(args.out, "a")
    only = set(args.only.split(",")) if args.only else None
    for variant in VARIANTS:
        label, sched, env = variant[:3]
        patch = variant[3] if len(variant) > 3 else {}
        if only and label not in only:
            continue
        for k in ("THMR_ATTN_HOIST", "THMR_FUSED_MLP", "THMR_FUSED_PROJ"):
            os.environ.pop(k, None)
        os.environ.update(env)
        c = dc.replace(base, vit=dc.replace(
            base.vit, merge_schedule=parse_sched(sched),
            scan_unroll=patch.get("scan_unroll", 1)))
        if patch.get("head_quant"):
            c = dc.replace(c, head=dc.replace(
                c.head, decoder=dc.replace(c.head.decoder,
                                           quant=patch["head_quant"])))

        # static quant calibration (mirrors bench.py BENCH_STATIC_QUANT=1)
        ccfg = dc.replace(c.vit, quant="calib")
        calib = jax.jit(lambda pp, im, _c=ccfg: ViT(_c).apply(
            {"params": pp["backbone"]},
            (im.astype(jnp.float32) / 255.0 - mean) / std,
            mutable=["quant"])[1]["quant"])
        pp = dict(params)
        pp["backbone_quant"] = calib(params, crops)

        @jax.jit
        def fn(pp_, crops_u8, _c=c):
            x = (crops_u8.astype(jnp.float32) / 255.0 - mean) / std
            out = forward_step(pp_, frozen, _c, smpl_model, x)
            return out["pred_vertices"]

        try:
            for _ in range(args.warmup):
                v = fn(pp, crops)
            float(jnp.sum(v))
        except Exception as e:  # noqa: BLE001 - sweep reports, not masks
            rec = {"label": label, "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(rec)); out_f.write(json.dumps(rec) + "\n")
            out_f.flush()
            continue

        dv = jnp.linalg.norm(v - v_ref, axis=-1)
        delta_mm = float(jnp.mean(dv)) * 1000

        t0 = time.perf_counter()
        for _ in range(args.iters):
            v = fn(pp, crops)
        float(jnp.sum(v))
        dt = time.perf_counter() - t0

        rec = {"label": label,
               "crops_per_sec": round(args.batch * args.iters / dt, 2),
               "delta_mm": round(delta_mm, 3),
               "merge": sched or "off", "env": env, "patch": patch,
               "weights": "trained-synth" if trained else "random"}
        print(json.dumps(rec))
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()
    out_f.close()


if __name__ == "__main__":
    main()
