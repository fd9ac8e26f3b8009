"""Numeric-drift regression: fixed-seed tiny-model outputs vs committed
golden values.

Refactors (kernel rewrites, fusion changes, layout changes) must not move
the math.  Regenerate with:
  python tests/test_golden_regression.py --regen
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "tiny_flagship_v1.npz")


def _compute_outputs():
    import __graft_entry__ as G
    from tokenhmr_tpu.models.tokenhmr import forward_step

    cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=2, tiny=True)
    img = jax.random.normal(jax.random.PRNGKey(42), (2, 64, 48, 3))
    out = forward_step(params, frozen, cfg, smpl_model, img)
    return {
        "pred_vertices": np.asarray(out["pred_vertices"]),
        "pred_keypoints_2d": np.asarray(out["pred_keypoints_2d"]),
        "pred_cam": np.asarray(out["pred_cam"]),
        "betas": np.asarray(out["pred_smpl_params"]["betas"]),
        "body_pose": np.asarray(out["pred_smpl_params"]["body_pose"]),
        "cls_logits_softmax": np.asarray(out["cls_logits_softmax"]),
    }


def test_tiny_flagship_outputs_match_golden():
    if not os.path.exists(GOLDEN_PATH):
        import pytest

        pytest.skip("golden fixture missing (run --regen)")
    golden = dict(np.load(GOLDEN_PATH))
    got = _compute_outputs()
    for k, v in golden.items():
        np.testing.assert_allclose(
            got[k], v, atol=2e-4, rtol=1e-3,
            err_msg=f"numeric drift in {k} — if the change is intentional, "
                    f"regenerate with `python tests/test_golden_regression.py --regen`",
        )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, **_compute_outputs())
        print(f"wrote {GOLDEN_PATH}")
