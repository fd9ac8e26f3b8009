"""int8 dynamic-quant matmul: pallas-vs-xla equivalence + accuracy bounds."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhmr_tpu.ops.qmatmul import (
    int8_dense, int8_matmul_pallas, int8_matmul_xla, quantize_cols,
    quantize_rows,
)


class TestQuantize:
    def test_row_quant_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(64, 256), jnp.float32)
        q, s = quantize_rows(x)
        assert q.dtype == jnp.int8 and s.shape == (64, 1)
        err = jnp.max(jnp.abs(q.astype(jnp.float32) * s - x))
        # max quant error is scale/2 per element
        assert float(err) <= float(jnp.max(s)) * 0.5 + 1e-6

    def test_col_quant_roundtrip(self):
        w = jnp.asarray(np.random.RandomState(1).randn(256, 128), jnp.float32)
        q, s = quantize_cols(w)
        assert q.dtype == jnp.int8 and s.shape == (1, 128)
        err = jnp.max(jnp.abs(q.astype(jnp.float32) * s - w))
        assert float(err) <= float(jnp.max(s)) * 0.5 + 1e-6

    def test_zero_row_is_finite(self):
        x = jnp.zeros((4, 256), jnp.float32)
        q, s = quantize_rows(x)
        assert np.all(np.isfinite(np.asarray(s))) and np.all(np.asarray(q) == 0)


class TestInt8Matmul:
    def _mk(self, M=64, K=256, N=256):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(M, K), jnp.float32)
        w = jnp.asarray(rng.randn(K, N) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(N) * 0.1, jnp.float32)
        return x, w, b

    @pytest.mark.parametrize("act", [None, "gelu_tanh"])
    def test_pallas_interpret_matches_xla(self, act):
        x, w, b = self._mk()
        xq, xs = quantize_rows(x)
        wq, ws = quantize_cols(w)
        ref = int8_matmul_xla(xq, xs, wq, ws, b, act, jnp.float32)
        out = int8_matmul_pallas(xq, xs, wq, ws, b, act, jnp.float32,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_pallas_interpret_nobias(self):
        x, w, _ = self._mk()
        xq, xs = quantize_rows(x)
        wq, ws = quantize_cols(w)
        ref = int8_matmul_xla(xq, xs, wq, ws, None, None, jnp.float32)
        out = int8_matmul_pallas(xq, xs, wq, ws, None, None, jnp.float32,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_untileable_shape_raises(self):
        xq = jnp.zeros((60, 256), jnp.int8)  # M=60 has no mult-of-32 divisor
        xs = jnp.ones((60, 1))
        wq = jnp.zeros((256, 256), jnp.int8)
        ws = jnp.ones((1, 256))
        with pytest.raises(ValueError, match="untileable"):
            int8_matmul_pallas(xq, xs, wq, ws)

    def test_int8_dense_accuracy(self):
        x, w, b = self._mk(M=128, K=512, N=384)
        ref = jnp.dot(x, w) + b
        out = int8_dense(x, w, b, out_dtype=jnp.float32, impl="xla")
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel  # W8A8 per-token/per-channel

    def test_int8_dense_leading_dims(self):
        x, w, b = self._mk(M=64, K=256, N=128)
        x3 = x.reshape(4, 16, 256)
        out = int8_dense(x3, w, b, out_dtype=jnp.float32, impl="xla")
        assert out.shape == (4, 16, 128)
        flat = int8_dense(x, w, b, out_dtype=jnp.float32, impl="xla")
        np.testing.assert_allclose(np.asarray(out).reshape(64, 128),
                                   np.asarray(flat), rtol=1e-6)


class TestQuantViT:
    def test_tiny_vit_int8_close_to_fp(self):
        import dataclasses
        from tokenhmr_tpu.models.vit import ViT, ViTConfig

        cfg = ViTConfig(img_size=(64, 48), embed_dim=128, depth=2,
                        num_heads=4, dtype=jnp.float32, attn_impl="xla")
        x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 48, 3),
                        jnp.float32)
        params = ViT(cfg).init(jax.random.PRNGKey(0), x)
        ref = ViT(cfg).apply(params, x)
        qcfg = dataclasses.replace(cfg, quant="int8")
        out = ViT(qcfg).apply(params, x)
        assert out.shape == ref.shape
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.05, rel

    def test_ln_quant_interpret_matches_reference(self):
        from tokenhmr_tpu.ops.qmatmul import ln_quant
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, 16, 256) * 3, jnp.float32)
        g = jnp.asarray(rng.rand(256) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(256) * 0.1, jnp.float32)
        q, s = ln_quant(x, g, b, interpret=True)
        assert q.shape == x.shape and s.shape == (2, 16, 1)
        # reference LN
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean**2, 0)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-6) * g + b
        deq = q.astype(jnp.float32) * s
        np.testing.assert_allclose(np.asarray(deq), np.asarray(y),
                                   atol=float(jnp.max(s)) * 0.51 + 1e-6)

    def test_calibrated_static_quant(self):
        """calib pass -> static fc1->fc2 scales ~= dynamic-quant output."""
        import dataclasses
        from tokenhmr_tpu.models.vit import ViT, ViTConfig

        cfg = ViTConfig(img_size=(64, 48), embed_dim=128, depth=2,
                        num_heads=4, dtype=jnp.float32, attn_impl="xla")
        x = jnp.asarray(np.random.RandomState(5).randn(2, 64, 48, 3),
                        jnp.float32)
        params = ViT(cfg).init(jax.random.PRNGKey(0), x)
        ref = ViT(cfg).apply(params, x)

        ccfg = dataclasses.replace(cfg, quant="calib")
        _, qcol = ViT(ccfg).apply(params, x, mutable=["quant"])
        scales = qcol["quant"]
        # the collection carries the (depth, hidden) stacked fc1 scales plus
        # pre-quantized weights (w_q int8 + w_s) for each of the 4 dense
        # layers per block
        blocks = scales["blocks"]
        assert blocks["mlp"]["fc1_out_scale"].shape == (2, 512)
        assert blocks["mlp"]["fc1"]["w_q"].dtype == jnp.int8
        assert blocks["mlp"]["fc2"]["w_q"].shape == (2, 512, 128)
        assert blocks["attn"]["qkv"]["w_q"].dtype == jnp.int8

        qcfg = dataclasses.replace(cfg, quant="int8")
        out_static = ViT(qcfg).apply(
            {"params": params["params"], "quant": scales}, x)
        out_dyn = ViT(qcfg).apply(params, x)
        rel_s = float(jnp.linalg.norm(out_static - ref) / jnp.linalg.norm(ref))
        rel_d = float(jnp.linalg.norm(out_dyn - ref) / jnp.linalg.norm(ref))
        assert rel_s < 0.05, rel_s
        # static per-channel should be in the same error ballpark as dynamic
        assert rel_s < 3 * rel_d + 0.01, (rel_s, rel_d)

    def test_param_tree_identical(self):
        """quant must not change the checkpoint surface."""
        from tokenhmr_tpu.models.vit import ViT, ViTConfig
        import dataclasses

        cfg = ViTConfig(img_size=(64, 48), embed_dim=64, depth=2,
                        num_heads=4, dtype=jnp.float32, attn_impl="xla")
        x = jnp.zeros((1, 64, 48, 3), jnp.float32)
        p0 = ViT(cfg).init(jax.random.PRNGKey(0), x)
        p1 = ViT(dataclasses.replace(cfg, quant="int8")).init(
            jax.random.PRNGKey(0), x)
        s0 = jax.tree_util.tree_structure(p0)
        s1 = jax.tree_util.tree_structure(p1)
        assert s0 == s1
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            assert a.shape == b.shape and a.dtype == b.dtype


class TestLnFusedFc1:
    """ln_int8_matmul_q8 (LN + int8 matmul + gelu + static int8-out) vs the
    composed reference (flax LN -> quantize_rows -> dequant matmul)."""

    def test_matches_composed_reference(self):
        import flax.linen as nn
        from tokenhmr_tpu.ops.qmatmul import (
            ln_int8_matmul_q8, quantize_cols, quantize_rows,
        )

        rng = np.random.RandomState(10)
        B, S, K, N = 2, 16, 128, 256
        x = rng.randn(B, S, K).astype(np.float32) * 2.0
        gamma = (rng.rand(K) + 0.5).astype(np.float32)
        beta = (rng.randn(K) * 0.1).astype(np.float32)
        w = rng.randn(K, N).astype(np.float32) * 0.1
        bias = rng.randn(N).astype(np.float32) * 0.05
        qs = (rng.rand(N).astype(np.float32) + 0.5) / 50.0
        wq, ws = quantize_cols(jnp.asarray(w))
        out = ln_int8_matmul_q8(
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), wq,
            ws.reshape(-1), jnp.asarray(bias), jnp.asarray(qs),
            act="gelu_tanh", interpret=True)
        assert out.shape == (B, S, N) and out.dtype == jnp.int8

        y = nn.LayerNorm(epsilon=1e-6).apply(
            {"params": {"scale": jnp.asarray(gamma),
                        "bias": jnp.asarray(beta)}}, jnp.asarray(x))
        xq, xs = quantize_rows(y.reshape(-1, K))
        h = (np.asarray(xq, np.float32) * np.asarray(xs)) @ (
            np.asarray(wq, np.float32) * np.asarray(ws)) + bias
        h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=True))
        ref = np.clip(np.rint(h / qs), -127, 127).astype(np.int8)
        # integer outputs: allow off-by-one from rounding-order differences
        diff = np.abs(out.astype(np.int32).reshape(-1, N)
                      - ref.astype(np.int32))
        assert float(np.mean(diff <= 1)) > 0.999
        assert int(diff.max()) <= 2


class TestFusedMlpQ8:
    def test_matches_two_kernel_static_path(self):
        """fused_mlp_q8 (K-chunked fc1+GELU+requant+fc2, hidden never in
        HBM) reproduces the existing static-quant two-matmul math."""
        from tokenhmr_tpu.ops.qmatmul import (fused_mlp_q8, quantize_cols,
                                              quantize_rows)

        rng = np.random.RandomState(0)
        M, K, NH = 64, 128, 512
        x = rng.randn(M, K).astype(np.float32)
        xq, xs = quantize_rows(jnp.asarray(x))
        w1 = rng.randn(K, NH).astype(np.float32) * 0.1
        w2 = rng.randn(NH, K).astype(np.float32) * 0.1
        b1 = rng.randn(NH).astype(np.float32) * 0.01
        b2 = rng.randn(K).astype(np.float32) * 0.01
        res = rng.randn(M, K).astype(np.float32)
        w1q, w1s = quantize_cols(jnp.asarray(w1))
        s = np.abs(rng.randn(NH).astype(np.float32)) * 0.02 + 0.05
        w2q, w2s = quantize_cols(jnp.asarray(w2) * s.reshape(NH, 1))

        out = fused_mlp_q8(xq, xs, w1q, w1s.reshape(-1), jnp.asarray(b1),
                           jnp.asarray(s), w2q, w2s.reshape(-1),
                           jnp.asarray(b2), jnp.asarray(res),
                           out_dtype=jnp.float32, tm=32, tc=128,
                           interpret=True)

        acc1 = (np.asarray(xq, np.int32) @ np.asarray(w1q, np.int64)
                ).astype(np.float32)
        h = acc1 * np.asarray(xs) * np.asarray(w1s) + b1
        h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=True))
        aq = np.clip(np.rint(h / s), -127, 127).astype(np.int8)
        acc2 = (aq.astype(np.int32) @ np.asarray(w2q, np.int64)
                ).astype(np.float32)
        ref = acc2 * np.asarray(w2s) + b2 + res
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)
