"""Re-export a flagship params npz from a training run directory.

The bench/eval/acc-table artifact (`--export-params` npz from cli/train.py)
is a 2.6 GB gitignored file; the durable lineage is the run dir's orbax
checkpoint (+ the tokenizer run dir), both committed at round end.  This
script closes the provenance gap that lost the round-3 trained weights
(VERDICT r3 weak #1): the npz is always regenerable from committed state.

  python scripts/export_params.py --run-dir artifacts_synth/run_r4 \
      --tokenizer-run-dir artifacts_synth/tok_r4 \
      --out artifacts_synth/flagship_r4.npz
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", required=True)
    p.add_argument("--tokenizer-run-dir", default=None,
                   help="frozen-tokenizer run dir the flagship trained "
                        "against (hparams.json records it); omit for the "
                        "random-frozen-codebook configuration")
    p.add_argument("--out", required=True)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                   help="restore on CPU by default — no device needed")
    args = p.parse_args()
    jax.config.update("jax_platforms", args.platform)

    import dataclasses as dc

    import __graft_entry__ as G
    from tokenhmr_tpu.models import posevq as PQ
    from tokenhmr_tpu.models import tokenhmr as T
    from tokenhmr_tpu.train.checkpoint import (CheckpointManager,
                                               save_params_npz)
    from tokenhmr_tpu.train.train_step import make_optimizer

    # model config: the flagship architecture, with the posevq arch taken
    # from the tokenizer run when given (mirrors cli/train.py assembly)
    cfg, frozen, _, params, _ = G._flagship(batch_size=1)
    if args.tokenizer_run_dir:
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
        params = T.init_tokenhmr(jax.random.PRNGKey(0), cfg, frozen)
        print(f"frozen tokenizer from {args.tokenizer_run_dir} "
              f"(step {tok_ckpt.latest_step()})")

    ckpt = CheckpointManager(args.run_dir)
    step = args.step if args.step is not None else ckpt.latest_step()
    assert step is not None, f"no checkpoints in {args.run_dir}"
    optimizer = make_optimizer(1e-4, 1e-4, 1.0)  # structure-only template
    state = ckpt.restore(
        {"params": params, "opt_state": optimizer.init(params)}, step=step)
    trees = {"params": state["params"], "frozen_params": frozen["params"],
             "codebook": {"codebook": frozen["vq_state"].codebook}}
    save_params_npz(args.out, trees, config=cfg)
    print(f"exported step-{step} params from {args.run_dir} to {args.out}")


if __name__ == "__main__":
    main()
