"""Two-stage pipeline integration: tokenizer -> freeze -> TokenHMR -> eval.

VERDICT r2 #8: the pieces (tokenizer training, frozen-codebook TokenHMR
training, eval) each had tests; this chains them end-to-end through the
REAL CLIs on tiny configs — proving the in-framework two-stage contract
(ref flow SURVEY §3.4 -> §3.2): a codebook trained by cli.train_tokenizer
is consumed frozen by cli.train, and the resulting params + tokenizer
export evaluate through the standard eval step.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_tokenizer_to_tokenhmr_chain(tmp_path):
    from cli.train import main as train_main
    from cli.train_tokenizer import main as tok_main

    tok_dir = tmp_path / "tok"
    run_dir = tmp_path / "hmr"
    export = tmp_path / "final.npz"

    # stage 1: train the tiny PoseVQ tokenizer on the physiological prior
    tok_main(["--synthetic", "--tiny", "--platform", "cpu",
              "--out-dir", str(tok_dir), "--total-iters", "10",
              "--eval-iters", "5", "--print-iters", "100",
              "--batch-size", "16"])
    best = json.loads((tok_dir / "best.json").read_text())
    assert np.isfinite(best["score"])

    # stage 2: train TokenHMR against the FROZEN stage-1 codebook on
    # on-device synthetic renders, with the PCT token CE enabled
    train_main(["--synth-render", "--tiny", "--platform", "cpu",
                "--tokenizer-run-dir", str(tok_dir),
                "--token-loss-weight", "0.1",
                "--total-steps", "3", "--batch-size", "8",
                "--log-steps", "1", "--checkpoint-steps", "1000",
                "--loader-workers", "0", "--out-dir", str(run_dir),
                "--export-params", str(export)])
    assert export.exists()
    m = [json.loads(l) for l in
         (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert "token" in m[0] and np.isfinite(m[0]["token"])

    # stage 3: reload the export and evaluate through the standard eval
    # step — the full frozen-decode path (classifier logits -> codebook ->
    # PoseVQ decoder -> SMPL) must produce finite geometry
    import dataclasses as dc

    import __graft_entry__ as G
    from tokenhmr_tpu.data.synth_crops import SynthConfig, make_synth_batch_fn
    from tokenhmr_tpu.models import posevq as PQ
    from tokenhmr_tpu.models.humanoid import humanoid_smpl_model
    from tokenhmr_tpu.train.checkpoint import load_params_npz
    from tokenhmr_tpu.train.train_step import make_eval_step
    from tokenhmr_tpu.utils.evaluator import Evaluator

    trees, cfg_d = load_params_npz(str(export))
    cfg, frozen0, _, _, _ = G._flagship(batch_size=1, tiny=True)
    pq_cfg = PQ.PoseVQConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in cfg_d["posevq"].items()
        if k in {f.name for f in dc.fields(PQ.PoseVQConfig)} - {"dtype"}})
    cfg = dc.replace(
        cfg, posevq=pq_cfg,
        head=dc.replace(cfg.head, token_class_num=pq_cfg.nb_code,
                        token_num=pq_cfg.num_tokens))
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    params = as_jnp(trees["params"])
    frozen = {"params": as_jnp(trees["frozen_params"]),
              "vq_state": frozen0["vq_state"]._replace(
                  codebook=jnp.asarray(trees["codebook"]["codebook"]))}
    smpl_model = humanoid_smpl_model(num_vertices=400)

    gen = jax.jit(make_synth_batch_fn(
        smpl_model, SynthConfig(height=64, width=48)), static_argnums=1)
    batch = gen(jax.random.PRNGKey(11), 4)
    out = jax.jit(make_eval_step(cfg, smpl_model, frozen))(params, batch)
    assert np.isfinite(np.asarray(out["pred_vertices"])).all()

    # GT vertices for the PVE/MPJPE protocols
    from tokenhmr_tpu.models.smpl import smpl_openpose_forward
    gt = smpl_openpose_forward(
        smpl_model, batch["smpl_params"]["betas"],
        batch["smpl_params"]["global_orient"],
        batch["smpl_params"]["body_pose"])
    ev = Evaluator(dataset_length=4, keypoint_list=list(range(25, 37)))
    vals = ev(
        {"pred_keypoints_3d": np.asarray(out["pred_keypoints_3d"]),
         "pred_vertices": np.asarray(out["pred_vertices"])},
        {"keypoints_3d": np.asarray(batch["keypoints_3d"]),
         "vertices": np.asarray(gt["vertices"])})
    res = ev.get_metrics_dict()
    assert np.isfinite(res["mode_mpjpe"]) and res["mode_mpjpe"] > 0
    assert np.isfinite(res["mode_re"]) and np.isfinite(res["mode_pve"])
