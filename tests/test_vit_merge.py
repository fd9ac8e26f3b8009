"""ViT token-merging inference path (vit_apply + merge_schedule)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhmr_tpu.models.vit import ViT, ViTConfig, vit_apply

TINY = ViTConfig(img_size=(64, 48), embed_dim=64, depth=4, num_heads=4,
                 dtype=jnp.float32, drop_path_rate=0.0)


@pytest.fixture(scope="module")
def tiny_vit():
    params = ViT(TINY).init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 48, 3)))["params"]
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 48, 3),
                    jnp.float32)
    return params, x


def test_empty_schedule_matches_plain_apply(tiny_vit):
    params, x = tiny_vit
    ref = ViT(TINY).apply({"params": params}, x)
    out, sizes = vit_apply(TINY, {"params": params}, x)
    assert sizes is None
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_merged_shapes_and_sizes(tiny_vit):
    params, x = tiny_vit
    cfg = dataclasses.replace(TINY, merge_schedule=((1, 2), (3, 2)))
    out, sizes = vit_apply(cfg, {"params": params}, x)
    S0 = TINY.num_patches  # 4x3 grid at 64x48/16 = 12
    assert out.shape == (2, S0 - 4, TINY.embed_dim)
    assert sizes.shape == (2, S0 - 4)
    # patch mass conserved through both merges
    np.testing.assert_allclose(np.asarray(jnp.sum(sizes, axis=-1)),
                               float(S0), rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_merged_close_to_exact_on_smooth_input(tiny_vit):
    """Merging duplicate tokens is near-lossless: feed a constant image so
    all patch tokens are identical up to pos-embed; a small merge should
    barely move the mean output feature."""
    params, _ = tiny_vit
    x = jnp.ones((1, 64, 48, 3), jnp.float32) * 0.25
    ref = ViT(TINY).apply({"params": params}, x)
    cfg = dataclasses.replace(TINY, merge_schedule=((2, 2),))
    out, sizes = vit_apply(cfg, {"params": params}, x)
    ref_mean = np.asarray(jnp.mean(ref, axis=1))
    # size-weighted mean over merged tokens approximates the token mean
    w = np.asarray(sizes)[..., None]
    out_mean = np.asarray(jnp.sum(out * w, axis=1)) / np.asarray(
        jnp.sum(sizes, axis=1, keepdims=True))
    err = np.abs(out_mean - ref_mean).max()
    scale = np.abs(ref_mean).max() + 1e-6
    assert err / scale < 0.05, err / scale


def test_full_model_with_merge_runs():
    """forward_step end-to-end with a merge schedule (tiny flagship)."""
    import __graft_entry__ as G
    from tokenhmr_tpu.models.tokenhmr import forward_step

    cfg, frozen, smpl_model, params, img = G._flagship(batch_size=2, tiny=True)
    vcfg = dataclasses.replace(cfg.vit, merge_schedule=((1, 2),))
    mcfg = dataclasses.replace(cfg, vit=vcfg)
    out = jax.jit(
        lambda p, i: forward_step(p, frozen, mcfg, smpl_model, i)
    )(params, img)
    assert out["pred_vertices"].shape[0] == 2
    assert np.all(np.isfinite(np.asarray(out["pred_vertices"])))


def test_merge_metric_x_vs_keys_both_run(tiny_vit):
    """merge_metric selects the matching features only: both variants run,
    produce the same shapes/sizes accounting, and (generically) different
    merge plans."""
    params, x = tiny_vit
    outs = {}
    for metric in ("keys", "x"):
        cfg = dataclasses.replace(TINY, merge_schedule=((1, 3),),
                                  merge_metric=metric)
        out, sizes = vit_apply(cfg, {"params": params}, x)
        assert out.shape == (2, TINY.num_patches - 3, TINY.embed_dim)
        np.testing.assert_allclose(np.asarray(jnp.sum(sizes, axis=-1)),
                                   float(TINY.num_patches), rtol=1e-5)
        outs[metric] = np.asarray(out)
    # with random weights the two metrics should pick different pairs
    assert not np.allclose(outs["keys"], outs["x"])


def test_scan_unroll_bit_exact(tiny_vit):
    """scan_unroll only changes loop scheduling (carry double-buffer
    amortization, docs/PERF_NOTES.md) — outputs must be bit-identical in
    both the plain and the merged forward."""
    params, x = tiny_vit
    for unroll in (2, 4):
        c_u = dataclasses.replace(TINY, scan_unroll=unroll)
        ref = ViT(TINY).apply({"params": params}, x)
        out = ViT(c_u).apply({"params": params}, x)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    sched = ((2, 4),)
    c1 = dataclasses.replace(TINY, merge_schedule=sched)
    c2 = dataclasses.replace(TINY, merge_schedule=sched, scan_unroll=2)
    m1, s1 = vit_apply(c1, {"params": params}, x)
    m2, s2 = vit_apply(c2, {"params": params}, x)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
