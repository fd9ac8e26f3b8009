"""Token-merging op (ops/merge.py) unit tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhmr_tpu.ops.merge import bipartite_soft_match, merge_tokens


def test_shapes_and_size_conservation():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 24, 16).astype(np.float32))
    out, sizes = merge_tokens(x, None, r=5)
    assert out.shape == (4, 19, 16)
    assert sizes.shape == (4, 19)
    # total "mass" (number of original patches) is conserved
    np.testing.assert_allclose(np.asarray(jnp.sum(sizes, axis=-1)), 24.0, rtol=1e-5)


def test_merges_identical_tokens_exactly():
    """If the most similar pairs are exact duplicates, merging them is lossless."""
    rng = np.random.RandomState(1)
    base = rng.randn(1, 8, 4).astype(np.float32)
    # make tokens 0 and 2 (set A) exact copies of tokens 1 and 3 (set B)
    base[0, 0] = base[0, 1]
    base[0, 2] = base[0, 3]
    x = jnp.asarray(base)
    out, sizes = merge_tokens(x, None, r=2)
    assert out.shape == (1, 6, 4)
    # the merged B tokens keep their value (mean of identical tokens)
    out_np = np.asarray(out)
    for val in (base[0, 1], base[0, 3]):
        dists = np.linalg.norm(out_np[0] - val, axis=-1)
        assert dists.min() < 1e-5
    # their sizes became 2
    merged_sizes = np.sort(np.asarray(sizes)[0])
    np.testing.assert_allclose(merged_sizes, [1, 1, 1, 1, 2, 2])


def test_weighted_mean_semantics():
    """Merging with pre-existing sizes is a size-weighted mean."""
    # S=4: A = {0, 2}, B = {1, 3}. Make token 0 similar to token 1 only.
    x = jnp.asarray([[[1.0, 0.0], [3.0, 0.0], [0.0, 5.0], [0.0, -5.0]]])
    sizes = jnp.asarray([[1.0, 3.0, 1.0, 1.0]])
    out, new_sizes = merge_tokens(x, sizes, r=1)
    out_np, ns = np.asarray(out[0]), np.asarray(new_sizes[0])
    # token 0 (size 1, value 1) into token 1 (size 3, value 3): mean = 2.5
    i = int(np.argmax(ns))
    assert ns[i] == 4.0
    np.testing.assert_allclose(out_np[i], [2.5, 0.0], atol=1e-6)


def test_match_picks_most_similar():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 12, 8).astype(np.float32)
    src, dst, keep = bipartite_soft_match(jnp.asarray(x), r=3)
    assert src.shape == (2, 3) and dst.shape == (2, 3) and keep.shape == (2, 3)
    # src/keep together enumerate all of A exactly once
    both = np.sort(np.concatenate([np.asarray(src), np.asarray(keep)], axis=1), axis=1)
    np.testing.assert_array_equal(both, np.tile(np.arange(6), (2, 1)))
    # each matched dst is the argmax-similarity B token for its src
    m = x / np.linalg.norm(x, axis=-1, keepdims=True)
    sim = np.einsum("bac,bkc->bak", m[:, 0::2], m[:, 1::2])
    for b in range(2):
        for j in range(3):
            s = int(np.asarray(src)[b, j])
            assert int(np.asarray(dst)[b, j]) == int(np.argmax(sim[b, s]))


def test_jits_with_static_r():
    f = jax.jit(lambda x: merge_tokens(x, None, 4))
    out, sizes = f(jnp.ones((2, 16, 8)))
    assert out.shape == (2, 12, 8)


def test_hoisted_attention_kernel_matches_base():
    """THMR_ATTN_HOIST=1 (cross-row phase hoist) is numerically identical
    to the per-row three-phase schedule (interpret mode)."""
    import os

    from tokenhmr_tpu.ops.attention import ln_qkv_mha_q8
    from tokenhmr_tpu.ops.qmatmul import quantize_cols

    rng = np.random.RandomState(0)
    B, S, K, H, D = 4, 16, 32, 4, 8
    x = jnp.asarray(rng.randn(B, S, K).astype(np.float32))
    g = jnp.asarray(rng.rand(K).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(K).astype(np.float32) * 0.1)
    w = rng.randn(K, 3 * H * D).astype(np.float32) * 0.1
    wq, ws = quantize_cols(jnp.asarray(w))
    bias = jnp.asarray(rng.randn(3 * H * D).astype(np.float32) * 0.01)
    outs = {}
    for hoist in ("0", "1", "auto"):
        os.environ["THMR_ATTN_HOIST"] = hoist
        try:
            oq, osc = ln_qkv_mha_q8(x, g, b, wq, ws.reshape(-1), bias,
                                    D ** -0.5, H, interpret=True)
        finally:
            os.environ.pop("THMR_ATTN_HOIST", None)
        outs[hoist] = np.asarray(oq.astype(jnp.float32) * osc)
    np.testing.assert_allclose(outs["0"], outs["1"], atol=2e-2)
    # auto at this tiny shape picks the hoisted kernel at R=4 (adaptive
    # row blocks) — must match the per-row schedule too
    np.testing.assert_allclose(outs["0"], outs["auto"], atol=2e-2)


def test_hoist_plan_vmem_budget():
    """auto-hoist degrades to the per-row kernel exactly where the real
    v5e compile failed (flagship S=192), and raises R at merged sizes."""
    from tokenhmr_tpu.ops.attention import _hoist_plan

    flagship = dict(B=128, K=1280, THD=3840, HD=1280, num_heads=16)
    on, r = _hoist_plan("auto", S=192, r_default=2, **flagship)
    assert not on and r == 2            # scores scratch alone ~4.7 MB @ R=2
    on, r = _hoist_plan("auto", S=112, r_default=2, **flagship)
    assert on and r == 2                # first merged segment of the default
    on, r = _hoist_plan("auto", S=40, r_default=2, **flagship)
    assert on and r >= 4                # deep merged segments batch more rows
    assert _hoist_plan("0", S=40, r_default=2, **flagship) == (False, 2)
    assert _hoist_plan("1", S=40, r_default=2, **flagship) == (True, 2)


def test_hoisted_block_kernel_matches_base():
    """attn_block_q8's phase-hoisted variant (proj+residual fused, R rows
    per program) matches the per-row block kernel in interpret mode."""
    from tokenhmr_tpu.ops import attention as A
    from tokenhmr_tpu.ops.qmatmul import quantize_cols

    rng = np.random.RandomState(3)
    B, S, K, H, D = 4, 16, 32, 2, 8
    HD = H * D
    x = jnp.asarray(rng.randn(B, S, K).astype(np.float32))
    res = jnp.asarray(rng.randn(B, S, K).astype(np.float32))
    g = jnp.asarray((rng.rand(K) + 0.5).astype(np.float32))
    b = jnp.asarray((rng.randn(K) * 0.1).astype(np.float32))
    wq, ws = quantize_cols(jnp.asarray(rng.randn(K, 3 * HD).astype(np.float32) * 0.1))
    bias = jnp.asarray(rng.randn(3 * HD).astype(np.float32) * 0.05)
    wqp, wsp = quantize_cols(jnp.asarray(rng.randn(HD, K).astype(np.float32) * 0.1))
    bp = jnp.asarray(rng.randn(K).astype(np.float32) * 0.05)
    outs = {}
    for hoist in ("0", "1", "auto"):
        os.environ["THMR_ATTN_HOIST"] = hoist
        try:
            out = A.attn_block_q8(x, g, b, wq, ws.reshape(-1), bias,
                                  wqp, wsp.reshape(-1), bp, res,
                                  D ** -0.5, H, interpret=True)
        finally:
            os.environ.pop("THMR_ATTN_HOIST", None)
        outs[hoist] = np.asarray(out, np.float32)
    np.testing.assert_allclose(outs["0"], outs["1"], atol=2e-2)
    # auto picks R=4 at this tiny shape — covers the R>2 hoisted path
    np.testing.assert_allclose(outs["0"], outs["auto"], atol=2e-2)


def test_hoist_plan_proj_vmem_budget():
    """proj=True adds the resident proj weights + bf16 residual/out blocks
    + R-row f32 out scratch: the fused block kernel degrades to per-row
    one merge site earlier than the qkv-only kernel."""
    from tokenhmr_tpu.ops.attention import _hoist_plan

    flagship = dict(B=128, K=1280, THD=3840, HD=1280, num_heads=16)
    on, r = _hoist_plan("auto", S=112, r_default=2, proj=True, **flagship)
    assert not on and r == 2            # fits at 112 WITHOUT proj, not with
    on, r = _hoist_plan("auto", S=64, r_default=2, proj=True, **flagship)
    assert on and r == 2
    on, r = _hoist_plan("auto", S=40, r_default=2, proj=True, **flagship)
    assert on and r == 4
