"""Model-stack tests: attention, ViT, decoder, token head, full forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokenhmr_tpu.models import posevq as PQ
from tokenhmr_tpu.models import smpl as S
from tokenhmr_tpu.models import tokenhmr as T
from tokenhmr_tpu.models.token_head import TokenHeadConfig, default_mean_params
from tokenhmr_tpu.models.transformer import DecoderConfig, TransformerDecoder
from tokenhmr_tpu.models.vit import ViT, ViTConfig, slice_to_vit_aspect
from tokenhmr_tpu.ops.attention import mha_xla, mha


TINY_VIT = ViTConfig(
    img_size=(64, 48), embed_dim=64, depth=2, num_heads=4,
    drop_path_rate=0.1, dtype=jnp.float32,
)
TINY_DEC = DecoderConfig(dim=32, depth=2, heads=2, dim_head=8, mlp_dim=32, context_dim=64)
TINY_PQ = PQ.PoseVQConfig(code_dim=16, nb_code=32, width=32, depth=1)
TINY_HEAD = TokenHeadConfig(
    token_num=160, token_class_num=32, decoder=TINY_DEC,
    hidden_dim=8, hidden_inter_dim=16, token_inter_dim=8,
)


class TestAttention:
    def test_xla_matches_manual(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 3, 5, 8).astype(np.float32))
        k = jnp.asarray(rng.randn(2, 3, 7, 8).astype(np.float32))
        v = jnp.asarray(rng.randn(2, 3, 7, 8).astype(np.float32))
        out = np.asarray(mha_xla(q, k, v))
        scores = np.einsum("bhsd,bhtd->bhst", q, k) / np.sqrt(8)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        exp = np.einsum("bhst,bhtd->bhsd", p, v)
        np.testing.assert_allclose(out, exp, atol=1e-5)

    def test_auto_dispatch_cpu(self):
        q = jnp.ones((1, 2, 4, 8))
        out = mha(q, q, q)
        assert out.shape == (1, 2, 4, 8)

    def test_pallas_interpret_matches_xla(self):
        """Run the Pallas kernel in interpreter mode and compare."""
        from tokenhmr_tpu.ops import attention as A
        import functools
        from jax.experimental import pallas as pl

        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(2, 2, 16, 8).astype(np.float32))
        k = jnp.asarray(rng.randn(2, 2, 16, 8).astype(np.float32))
        v = jnp.asarray(rng.randn(2, 2, 16, 8).astype(np.float32))
        B, H, Sq, D = q.shape
        out = pl.pallas_call(
            functools.partial(A._mha_kernel, scale=D ** -0.5),
            grid=(B * H,),
            in_specs=[pl.BlockSpec((1, Sq, D), lambda i: (i, 0, 0))] * 3,
            out_specs=pl.BlockSpec((1, Sq, D), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
            interpret=True,
        )(q.reshape(B * H, Sq, D), k.reshape(B * H, Sq, D), v.reshape(B * H, Sq, D))
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, H, Sq, D), np.asarray(mha_xla(q, k, v)), atol=1e-5
        )

    def test_custom_vjp_matches_autodiff(self):
        from tokenhmr_tpu.ops.attention import _mha_pallas_bwd, mha_xla

        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(1, 2, 6, 4).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 2, 6, 4).astype(np.float32))
        v = jnp.asarray(rng.randn(1, 2, 6, 4).astype(np.float32))
        g = jnp.asarray(rng.randn(1, 2, 6, 4).astype(np.float32))
        scale = 4 ** -0.5
        _, vjp = jax.vjp(lambda q, k, v: mha_xla(q, k, v, scale), q, k, v)
        dq_a, dk_a, dv_a = vjp(g)
        dq_b, dk_b, dv_b = _mha_pallas_bwd(scale, (q, k, v), g)
        np.testing.assert_allclose(np.asarray(dq_a), np.asarray(dq_b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dk_a), np.asarray(dk_b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dv_a), np.asarray(dv_b), atol=1e-5)


class TestViT:
    def test_shapes_and_grid(self):
        cfg = TINY_VIT
        assert cfg.grid_hw == (4, 3)
        model = ViT(cfg)
        x = jnp.zeros((2, 64, 48, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 12, 64)
        assert out.dtype == jnp.float32

    def test_square_input_sliced(self):
        # (64, 64) square -> width slice to (64, 48)? slice is 32:-32 of 256.
        # For the tiny config the slice helper removes 32px per side only for
        # real-size inputs; here we verify the helper directly.
        x = jnp.zeros((1, 256, 256, 3))
        assert slice_to_vit_aspect(x).shape == (1, 256, 192, 3)

    def test_vit_h_config_dims(self):
        cfg = ViTConfig()
        assert cfg.grid_hw == (16, 12)
        assert cfg.num_patches == 192

    def test_drop_path_train_vs_eval(self):
        cfg = TINY_VIT
        model = ViT(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 48, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out_eval1 = model.apply(params, x)
        out_eval2 = model.apply(params, x)
        np.testing.assert_array_equal(np.asarray(out_eval1), np.asarray(out_eval2))
        out_train = model.apply(
            params, x, train=True, rngs={"drop_path": jax.random.PRNGKey(2)}
        )
        assert not np.allclose(np.asarray(out_train), np.asarray(out_eval1))


class TestDecoder:
    def test_query_cross_attn(self):
        dec = TransformerDecoder(TINY_DEC)
        ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 64))
        tok = jnp.zeros((2, 1, 1))
        params = dec.init(jax.random.PRNGKey(1), tok, ctx)
        out = dec.apply(params, tok, ctx)
        assert out.shape == (2, 1, 32)
        # context actually matters
        out2 = dec.apply(params, tok, ctx * 2.0)
        assert not np.allclose(np.asarray(out), np.asarray(out2))


def _tiny_frozen():
    pq_model = PQ.PoseVQ(TINY_PQ)
    pq_params = pq_model.init(jax.random.PRNGKey(3), jnp.zeros((1, 21, 6)))
    vq_state = PQ.vq_init_state(TINY_PQ)
    # give the codebook real values
    x = jax.random.normal(jax.random.PRNGKey(4), (128, TINY_PQ.code_dim))
    _, _, _, vq_state = PQ.vq_ema_reset_forward(vq_state, x, jax.random.PRNGKey(5))
    return {"params": pq_params, "vq_state": vq_state}


class TestTokenHMR:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = T.TokenHMRConfig(vit=TINY_VIT, head=TINY_HEAD, posevq=TINY_PQ)
        frozen = _tiny_frozen()
        smpl_model = S.synthetic_smpl_model(num_vertices=300, num_joints=24)
        params = T.init_tokenhmr(jax.random.PRNGKey(0), cfg, frozen)
        return cfg, frozen, smpl_model, params

    def test_forward_contract(self, setup):
        cfg, frozen, smpl_model, params = setup
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 48, 3))
        out = T.forward_step(params, frozen, cfg, smpl_model, img)
        assert out["pred_cam"].shape == (2, 3)
        assert out["pred_smpl_params"]["global_orient"].shape == (2, 1, 3, 3)
        assert out["pred_smpl_params"]["body_pose"].shape == (2, 23, 3, 3)
        assert out["pred_smpl_params"]["betas"].shape == (2, 10)
        assert out["pred_cam_t"].shape == (2, 3)
        assert out["pred_vertices"].shape == (2, 300, 3)
        assert out["pred_keypoints_3d"].shape == (2, 44, 3)
        assert out["pred_keypoints_2d"].shape == (2, 44, 2)
        assert out["cls_logits_softmax"].shape == (2, 160, 32)
        # simplex check
        np.testing.assert_allclose(
            np.asarray(out["cls_logits_softmax"].sum(-1)), 1.0, atol=1e-5
        )
        # body poses are valid rotations
        bp = np.asarray(out["pred_smpl_params"]["body_pose"])
        np.testing.assert_allclose(np.linalg.det(bp), 1.0, atol=1e-4)

    def test_jit_forward(self, setup):
        cfg, frozen, smpl_model, params = setup
        img = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 48, 3))
        f = jax.jit(
            lambda p, i: T.forward_step(p, frozen, cfg, smpl_model, i)
        )
        out = f(params, img)
        ref = T.forward_step(params, frozen, cfg, smpl_model, img)
        np.testing.assert_allclose(
            np.asarray(out["pred_vertices"]), np.asarray(ref["pred_vertices"]), atol=1e-5
        )

    def test_grads_flow_to_live_params_only(self, setup):
        cfg, frozen, smpl_model, params = setup
        img = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 48, 3))

        def loss(p, f):
            out = T.forward_step(p, f, cfg, smpl_model, img)
            return jnp.sum(out["pred_keypoints_2d"] ** 2) + jnp.sum(out["pred_vertices"] ** 2)

        g_live = jax.grad(loss, argnums=0)(params, frozen)
        leaves = jax.tree_util.tree_leaves(g_live)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
        # frozen tree receives zero grad (stop_gradient); differentiate only
        # its float leaves (VQState.initialized is bool)
        def loss_frozen(fp, cb):
            f2 = {
                "params": fp,
                "vq_state": frozen["vq_state"]._replace(codebook=cb),
            }
            return loss(params, f2)

        g_fp, g_cb = jax.grad(loss_frozen, argnums=(0, 1))(
            frozen["params"], frozen["vq_state"].codebook
        )
        fleaves = jax.tree_util.tree_leaves(g_fp) + [g_cb]
        assert all(float(jnp.abs(l).max()) == 0.0 for l in fleaves)

    def test_regression_head_variant(self, setup):
        cfg, frozen, smpl_model, _ = setup
        cfg2 = T.TokenHMRConfig(
            vit=TINY_VIT, head=TINY_HEAD, posevq=TINY_PQ, head_type="transformer_decoder"
        )
        params2 = T.init_tokenhmr(jax.random.PRNGKey(5), cfg2, frozen)
        img = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 48, 3))
        out = T.forward_step(params2, frozen, cfg2, smpl_model, img)
        assert out["pred_vertices"].shape == (2, 300, 3)
        assert "cls_logits_softmax" not in out


class TestPackedAttention:
    def test_packed_xla_matches_unpacked(self):
        from tokenhmr_tpu.ops.attention import mha_packed_xla, mha_xla, _split_packed
        rng = np.random.RandomState(0)
        H, D = 4, 8
        qkv = jnp.asarray(rng.randn(2, 6, 3 * H * D).astype(np.float32))
        out = np.asarray(mha_packed_xla(qkv, D ** -0.5, H))
        q, k, v = _split_packed(qkv, H)
        ref = np.asarray(mha_xla(q, k, v)).transpose(0, 2, 1, 3).reshape(2, 6, H * D)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_packed_kernel_interpret_matches_xla(self):
        from tokenhmr_tpu.ops import attention as A
        import functools
        from jax.experimental import pallas as pl
        rng = np.random.RandomState(3)
        B, S, H, D = 2, 16, 2, 8
        qkv = jnp.asarray(rng.randn(B, S, 3 * H * D).astype(np.float32))
        from jax.experimental.pallas import tpu as pltpu
        out = pl.pallas_call(
            functools.partial(A._mha_packed_kernel, scale=D ** -0.5,
                              num_heads=H, head_dim=D),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, S, 3 * H * D), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, S, H * D), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, S, H * D), qkv.dtype),
            scratch_shapes=[pltpu.VMEM((H, S, S), jnp.float32)],
            interpret=True,
        )(qkv)
        ref = A.mha_packed_xla(qkv, D ** -0.5, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_packed_q8_kernel_interpret_matches_xla(self):
        """int8-out epilogue: dequantized kernel output ~= xla attention."""
        from tokenhmr_tpu.ops import attention as A
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        rng = np.random.RandomState(4)
        B, S, H, D = 2, 16, 2, 8
        qkv = jnp.asarray(rng.randn(B, S, 3 * H * D).astype(np.float32))
        oq, os_ = pl.pallas_call(
            functools.partial(A._mha_packed_q8_kernel, scale=D ** -0.5,
                              num_heads=H, head_dim=D, block_rows=1),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, S, 3 * H * D), lambda b: (b, 0, 0))],
            out_specs=(pl.BlockSpec((1, S, H * D), lambda b: (b, 0, 0)),
                       pl.BlockSpec((1, S, 1), lambda b: (b, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((B, S, H * D), jnp.int8),
                       jax.ShapeDtypeStruct((B, S, 1), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((H, S, S), jnp.float32),
                            pltpu.VMEM((S, H * D), jnp.float32)],
            interpret=True,
        )(qkv)
        ref = A.mha_packed_xla(qkv, D ** -0.5, H)
        deq = np.asarray(oq, np.float32) * np.asarray(os_)
        # per-row int8 quantization error bound: scale/2 per element
        max_scale = float(np.max(np.asarray(os_)))
        np.testing.assert_allclose(deq, np.asarray(ref),
                                   atol=max_scale * 0.51 + 1e-6)

    def test_packed_kernel_bias_interpret_matches_xla(self):
        """Per-key score bias (ToMe proportional attention) in the packed
        kernel == the XLA reference with the same bias."""
        from tokenhmr_tpu.ops import attention as A
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        rng = np.random.RandomState(5)
        B, S, H, D = 2, 16, 2, 8
        qkv = jnp.asarray(rng.randn(B, S, 3 * H * D).astype(np.float32))
        bias = jnp.asarray(np.log(rng.randint(1, 5, (B, S))).astype(np.float32))
        out = pl.pallas_call(
            functools.partial(A._mha_packed_kernel, scale=D ** -0.5,
                              num_heads=H, head_dim=D, has_bias=True),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, S, 3 * H * D), lambda b: (b, 0, 0)),
                      pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, S, H * D), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, S, H * D), qkv.dtype),
            scratch_shapes=[pltpu.VMEM((H, S, S), jnp.float32)],
            interpret=True,
        )(qkv, bias[:, None, :])
        ref = A.mha_packed_xla(qkv, D ** -0.5, H, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_packed_q8_kernel_bias_interpret_matches_xla(self):
        from tokenhmr_tpu.ops import attention as A
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        rng = np.random.RandomState(6)
        B, S, H, D = 2, 16, 2, 8
        qkv = jnp.asarray(rng.randn(B, S, 3 * H * D).astype(np.float32))
        bias = jnp.asarray(np.log(rng.randint(1, 5, (B, S))).astype(np.float32))
        oq, os_ = pl.pallas_call(
            functools.partial(A._mha_packed_q8_kernel, scale=D ** -0.5,
                              num_heads=H, head_dim=D, block_rows=1,
                              has_bias=True),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, S, 3 * H * D), lambda b: (b, 0, 0)),
                      pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0))],
            out_specs=(pl.BlockSpec((1, S, H * D), lambda b: (b, 0, 0)),
                       pl.BlockSpec((1, S, 1), lambda b: (b, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((B, S, H * D), jnp.int8),
                       jax.ShapeDtypeStruct((B, S, 1), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((H, S, S), jnp.float32),
                            pltpu.VMEM((S, H * D), jnp.float32)],
            interpret=True,
        )(qkv, bias[:, None, :])
        ref = A.mha_packed_xla(qkv, D ** -0.5, H, bias=bias)
        deq = np.asarray(oq, np.float32) * np.asarray(os_)
        max_scale = float(np.max(np.asarray(os_)))
        np.testing.assert_allclose(deq, np.asarray(ref),
                                   atol=max_scale * 0.51 + 1e-6)

    def test_packed_vjp_matches_autodiff(self):
        from tokenhmr_tpu.ops.attention import mha_packed_xla
        from tokenhmr_tpu.ops import attention as A
        rng = np.random.RandomState(1)
        qkv = jnp.asarray(rng.randn(1, 5, 3 * 2 * 4).astype(np.float32))
        g = jnp.asarray(rng.randn(1, 5, 2 * 4).astype(np.float32))
        scale = 4 ** -0.5
        _, vjp = jax.vjp(lambda x: mha_packed_xla(x, scale, 2), qkv)
        (ref,) = vjp(g)
        (got,) = A._mha_packed_bwd(scale, 2, (qkv,), g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestGeluVariants:
    def test_approx_vs_exact_close(self):
        import dataclasses
        cfg_a = dataclasses.replace(TINY_VIT, gelu_approx=True)
        cfg_e = dataclasses.replace(TINY_VIT, gelu_approx=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 48, 3))
        params = ViT(cfg_e).init(jax.random.PRNGKey(1), x)
        out_e = np.asarray(ViT(cfg_e).apply(params, x))
        out_a = np.asarray(ViT(cfg_a).apply(params, x))
        # tanh-gelu deviates by ~1e-3 relative on activations
        denom = np.abs(out_e).mean()
        assert np.abs(out_a - out_e).mean() / denom < 5e-3


class TestTokenLossTraining:
    def test_train_step_with_computed_gt_tokens(self):
        import optax
        from tokenhmr_tpu.train.train_step import make_optimizer, make_train_step
        from tokenhmr_tpu.models import smpl as S
        from tokenhmr_tpu.ops.rotations import axis_angle_to_matrix

        cfg = T.TokenHMRConfig(vit=TINY_VIT, head=TINY_HEAD, posevq=TINY_PQ)
        frozen = _tiny_frozen()
        smpl_model = S.synthetic_smpl_model(num_vertices=200, num_joints=24)
        params = T.init_tokenhmr(jax.random.PRNGKey(0), cfg, frozen)
        opt = make_optimizer(1e-4)
        step = jax.jit(make_train_step(
            cfg, smpl_model, frozen, opt, token_loss_weight=0.1,
            compute_gt_tokens=True))
        rng = np.random.RandomState(0)
        B = 2
        rm = np.asarray(axis_angle_to_matrix(
            jnp.asarray(rng.randn(B, 24, 3).astype(np.float32) * 0.2)))
        batch = {
            "img": jnp.asarray(rng.randn(B, 64, 48, 3).astype(np.float32)),
            "keypoints_2d": jnp.asarray(rng.rand(B, 44, 3).astype(np.float32)),
            "keypoints_3d": jnp.asarray(rng.rand(B, 44, 4).astype(np.float32)),
            "smpl_params": {
                "global_orient": jnp.asarray(rm[:, :1]),
                "body_pose": jnp.asarray(rm[:, 1:]),
                "betas": jnp.zeros((B, 10)),
            },
            "has_smpl_params": {
                "global_orient": jnp.ones(B), "body_pose": jnp.ones(B),
                "betas": jnp.ones(B),
            },
            "valid_3d": jnp.ones(B),
        }
        p2, o2, metrics = step(params, opt.init(params), batch, jax.random.PRNGKey(1))
        assert "token" in metrics and np.isfinite(float(metrics["token"]))
        assert float(metrics["token"]) > 0


class TestConditionalNorm:
    """t_cond_mlp parity: AdaptiveLayerNorm / ResidualMLP / frequency_embed
    (ref tokenhmr/lib/models/components/t_cond_mlp.py)."""

    def test_adaptive_norm_matches_torch(self):
        torch = pytest.importorskip("torch")
        from tokenhmr_tpu.models.transformer import AdaptiveLayerNorm

        rng = np.random.RandomState(0)
        B, N, D, C = 3, 5, 8, 6
        x = rng.randn(B, N, D).astype(np.float32)
        cond = rng.randn(B, C).astype(np.float32)
        mod = AdaptiveLayerNorm(D, C)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(cond))
        # randomize the FiLM linear + norm affine so the test isn't trivial
        lw = rng.randn(C, 2 * D).astype(np.float32) * 0.3
        lb = rng.randn(2 * D).astype(np.float32) * 0.1
        nw = rng.rand(D).astype(np.float32) + 0.5
        nb = rng.randn(D).astype(np.float32) * 0.1
        params = {"params": {
            "norm": {"scale": jnp.asarray(nw), "bias": jnp.asarray(nb)},
            "linear": {"kernel": jnp.asarray(lw), "bias": jnp.asarray(lb)},
        }}
        out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(cond)))

        tx, tc = torch.from_numpy(x), torch.from_numpy(cond)
        th = torch.nn.functional.layer_norm(
            tx, (D,), torch.from_numpy(nw), torch.from_numpy(nb), eps=1e-5)
        ab = tc @ torch.from_numpy(lw) + torch.from_numpy(lb)
        alpha, beta = ab.chunk(2, dim=-1)
        tref = th * (1 + alpha[:, None]) + beta[:, None]
        np.testing.assert_allclose(out, tref.numpy(), atol=1e-5)

    def test_zeros_init_is_plain_layernorm(self):
        from tokenhmr_tpu.models.transformer import AdaptiveLayerNorm

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 4, 16).astype(np.float32))
        cond = jnp.asarray(rng.randn(2, 7).astype(np.float32))
        mod = AdaptiveLayerNorm(16, 7)
        params = mod.init(jax.random.PRNGKey(0), x, cond)
        out = mod.apply(params, x, cond)
        import flax.linen as nn
        ref = nn.LayerNorm(epsilon=1e-5).apply(
            {"params": {"scale": jnp.ones(16), "bias": jnp.zeros(16)}}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_frequency_embed_matches_torch(self):
        torch = pytest.importorskip("torch")
        from tokenhmr_tpu.models.transformer import frequency_embed

        rng = np.random.RandomState(2)
        x = rng.randn(4, 3).astype(np.float32)
        out = np.asarray(frequency_embed(jnp.asarray(x), 6, 4.0))
        freqs = 2 ** torch.linspace(0, 4.0, steps=6)
        tx = torch.from_numpy(x).unsqueeze(-1)
        scaled = freqs.view(1, 1, -1) * tx
        tref = torch.cat([torch.sin(scaled), torch.cos(scaled), tx], -1).view(4, -1)
        assert out.shape == (4, 3 * (2 * 6 + 1))
        np.testing.assert_allclose(out, tref.numpy(), atol=1e-6)

    def test_ada_decoder_forward(self):
        cfg = DecoderConfig(dim=32, depth=2, heads=2, dim_head=8, mlp_dim=32,
                            context_dim=16, num_tokens=1, token_dim=1,
                            norm="ada", norm_cond_dim=12)
        dec = TransformerDecoder(cfg)
        rng = np.random.RandomState(3)
        inp = jnp.asarray(rng.randn(2, 1, 1).astype(np.float32))
        ctx = jnp.asarray(rng.randn(2, 6, 16).astype(np.float32))
        cond = jnp.asarray(rng.randn(2, 12).astype(np.float32))
        params = dec.init(jax.random.PRNGKey(0), inp, ctx, norm_cond=cond)
        out = dec.apply(params, inp, ctx, norm_cond=cond)
        assert out.shape == (2, 1, 32)
        assert np.isfinite(np.asarray(out)).all()
        # the condition actually reaches the graph: perturbing it moves the
        # output once the FiLM linear is non-zero
        p = jax.tree_util.tree_map(lambda v: v, params)
        flat = jax.tree_util.tree_leaves(
            p["params"]["transformer"]["sa_norm0"]["linear"])
        assert all(np.allclose(np.asarray(l), 0) for l in flat if l.ndim == 2)

    def test_residual_mlp_matches_torch(self):
        torch = pytest.importorskip("torch")
        from tokenhmr_tpu.models.transformer import ResidualMLP

        rng = np.random.RandomState(4)
        B, Din, H, Dout = 3, 5, 8, 4
        mod = ResidualMLP(hidden_dim=H, num_hidden_layers=2, output_dim=Dout,
                          num_blocks=1)
        x = rng.randn(B, Din).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))

        def dense(name):
            k = params["params"][name]
            return (torch.from_numpy(np.asarray(k["kernel"])),
                    torch.from_numpy(np.asarray(k["bias"])))

        def lnorm(name, v):
            k = params["params"][name]
            return torch.nn.functional.layer_norm(
                v, (H,), torch.from_numpy(np.asarray(k["scale"])),
                torch.from_numpy(np.asarray(k["bias"])), eps=1e-5)

        tx = torch.from_numpy(x)
        kw, kb = dense("stem")
        t = torch.relu(lnorm("stem_norm", tx @ kw + kb))
        h = t
        for i in range(2):
            kw, kb = dense(f"block0_fc{i}")
            h = torch.relu(lnorm(f"block0_norm{i}", h @ kw + kb))
        t = t + h
        kw, kb = dense("out")
        tref = t @ kw + kb
        out = np.asarray(mod.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(out, tref.numpy(), atol=1e-5)


class TestTransformerEncoder:
    """Self-attn encoder stack (ref pose_transformer.py:127-158, 241-298)."""

    def test_forward_and_jit(self):
        from tokenhmr_tpu.models.transformer import TransformerEncoder

        cfg = DecoderConfig(dim=32, depth=2, heads=2, dim_head=8, mlp_dim=48,
                            num_tokens=7, token_dim=5)
        enc = TransformerEncoder(cfg)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 7, 5).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = jax.jit(lambda p, v: enc.apply(p, v))(params, x)
        assert out.shape == (2, 7, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_frequency_token_embedding(self):
        from tokenhmr_tpu.models.transformer import TransformerEncoder

        cfg = DecoderConfig(dim=16, depth=1, heads=2, dim_head=4, mlp_dim=16,
                            num_tokens=3, token_dim=2)
        enc = TransformerEncoder(cfg, token_pe_numfreq=4)
        x = jnp.zeros((1, 3, 2))
        params = enc.init(jax.random.PRNGKey(0), x)
        # embedding kernel consumes token_dim * (2*numfreq + 1) features
        k = params["params"]["to_token_embedding"]["kernel"]
        assert k.shape == (2 * (2 * 4 + 1), 16)
        out = enc.apply(params, x)
        assert out.shape == (1, 3, 16)

    def test_ada_norm_variant(self):
        from tokenhmr_tpu.models.transformer import TransformerEncoder

        cfg = DecoderConfig(dim=16, depth=1, heads=2, dim_head=4, mlp_dim=16,
                            num_tokens=3, token_dim=2, norm="ada",
                            norm_cond_dim=6)
        enc = TransformerEncoder(cfg)
        x = jnp.ones((2, 3, 2))
        cond = jnp.ones((2, 6))
        params = enc.init(jax.random.PRNGKey(0), x, norm_cond=cond)
        out = enc.apply(params, x, norm_cond=cond)
        assert out.shape == (2, 3, 16)


class TestThreePhaseQ8Attention:
    """Three-phase q8 kernel (all-QK / all-softmax / all-PV) numerics."""

    def _run(self, has_bias):
        from tokenhmr_tpu.ops import attention as A
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        rng = np.random.RandomState(7)
        B, S, H, D = 2, 16, 2, 8
        qkv = jnp.asarray(rng.randn(B, S, 3 * H * D).astype(np.float32))
        in_specs = [pl.BlockSpec((1, S, 3 * H * D), lambda b: (b, 0, 0))]
        args = [qkv]
        bias = None
        if has_bias:
            bias = jnp.asarray(
                np.log(rng.randint(1, 5, (B, S))).astype(np.float32))
            in_specs.append(pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0)))
            args.append(bias[:, None, :])
        oq, os_ = pl.pallas_call(
            functools.partial(A._mha_packed_q8_kernel3, scale=D ** -0.5,
                              num_heads=H, head_dim=D, block_rows=1,
                              has_bias=has_bias),
            grid=(B,),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((1, S, H * D), lambda b: (b, 0, 0)),
                       pl.BlockSpec((1, S, 1), lambda b: (b, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((B, S, H * D), jnp.int8),
                       jax.ShapeDtypeStruct((B, S, 1), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((H, S, S), jnp.float32),
                            pltpu.VMEM((S, H * D), jnp.float32)],
            interpret=True,
        )(*args)
        ref = A.mha_packed_xla(qkv, D ** -0.5, H, bias=bias)
        deq = np.asarray(oq, np.float32) * np.asarray(os_)
        max_scale = float(np.max(np.asarray(os_)))
        np.testing.assert_allclose(deq, np.asarray(ref),
                                   atol=max_scale * 0.51 + 1e-6)

    def test_matches_xla(self):
        self._run(False)

    def test_matches_xla_with_bias(self):
        self._run(True)

    @pytest.mark.parametrize("phases,expect3", [("3", True), ("2", False)])
    def test_env_dispatch_selects_kernel(self, monkeypatch, phases, expect3):
        """THMR_ATTN_PHASES actually routes mha_packed_q8 to the right
        kernel: intercept pallas_call and inspect the partial it gets."""
        from tokenhmr_tpu.ops import attention as A
        import functools as _ft

        captured = {}

        def fake_pallas_call(kernel, **kw):
            captured["fn"] = kernel.func if isinstance(
                kernel, _ft.partial) else kernel
            return lambda *a: (jnp.zeros((2, 16, 16), jnp.int8),
                               jnp.zeros((2, 16, 1), jnp.float32))

        monkeypatch.setenv("THMR_ATTN_PHASES", phases)
        monkeypatch.setattr(A.pl, "pallas_call", fake_pallas_call)
        A.mha_packed_q8(jnp.zeros((2, 16, 48)), 0.35, 2)
        want = (A._mha_packed_q8_kernel3 if expect3
                else A._mha_packed_q8_kernel)
        assert captured["fn"] is want


class TestFusedQkvAttention:
    """qkv_mha_q8: fused int8 qkv projection + 3-phase attention + q8 out
    vs the composed reference (dequant matmul -> XLA attention)."""

    @pytest.mark.parametrize("has_bias", [False, True])
    def test_matches_composed_reference(self, has_bias):
        from tokenhmr_tpu.ops import attention as A
        from tokenhmr_tpu.ops.qmatmul import quantize_cols, quantize_rows

        rng = np.random.RandomState(8)
        B, S, K, H, D = 2, 16, 32, 2, 8
        THD = 3 * H * D
        x = rng.randn(B, S, K).astype(np.float32)
        w = rng.randn(K, THD).astype(np.float32) * 0.1
        bias = rng.randn(THD).astype(np.float32) * 0.05
        xq, xs = quantize_rows(jnp.asarray(x).reshape(-1, K))
        xq = xq.reshape(B, S, K)
        xs = xs.reshape(B, S, 1)
        wq, ws = quantize_cols(jnp.asarray(w))
        attn_bias = None
        if has_bias:
            attn_bias = jnp.asarray(
                np.log(rng.randint(1, 5, (B, S))).astype(np.float32))
        oq, os_ = A.qkv_mha_q8(xq, xs, wq, ws.reshape(-1), jnp.asarray(bias),
                               D ** -0.5, H, attn_bias=attn_bias,
                               interpret=True)
        # composed reference on the SAME quantized operands
        xd = np.asarray(xq, np.float32) * np.asarray(xs)
        wd = np.asarray(wq, np.float32) * np.asarray(ws)
        # the kernel parks the dequantized qkv in a bf16 VMEM scratch —
        # mirror that rounding in the reference
        qkv = jnp.asarray(xd.reshape(-1, K) @ wd + bias).reshape(
            B, S, THD).astype(jnp.bfloat16).astype(jnp.float32)
        ref = A.mha_packed_xla(qkv, D ** -0.5, H, bias=attn_bias)
        deq = np.asarray(oq, np.float32) * np.asarray(os_)
        max_scale = float(np.max(np.asarray(os_)))
        # int8 quantization (scale/2) + bf16 probability rounding in the
        # PV matmul (the f32 reference keeps f32 probs)
        np.testing.assert_allclose(deq, np.asarray(ref),
                                   atol=max_scale * 0.51 + 4e-3)

    def test_vit_attention_dispatch_gates(self, monkeypatch):
        """ViTAttention only takes the fused path when the producer supplied
        a static int8 x_prequant (ln_quant) AND the flag is on — a broken
        gate would crash or silently de-fuse (VERDICT-style wiring test)."""
        from tokenhmr_tpu.models import vit as V

        calls = []

        def fake_fused(self, x_prequant, residual, attn_bias, scale,
                       ln_raw=None):
            calls.append("fused")
            lead = (ln_raw[0] if ln_raw is not None else x_prequant[0]).shape[:-1]
            return jnp.zeros(lead + (self.cfg.embed_dim,), jnp.float32)

        def fake_q8(qkv, scale, num_heads, block_rows=None, bias=None):
            calls.append("split")
            B, S, THD = qkv.shape
            return (jnp.zeros((B, S, THD // 3), jnp.int8),
                    jnp.ones((B, S, 1), jnp.float32))

        monkeypatch.setattr(V.ViTAttention, "_fused_qkv_attention", fake_fused)
        monkeypatch.setattr(V, "mha_packed_q8", fake_q8)
        cfg = V.ViTConfig(img_size=(64, 48), embed_dim=64, depth=1,
                          num_heads=4, dtype=jnp.float32, quant="int8",
                          attn_impl="pallas")
        att = V.ViTAttention(cfg)
        xq = jnp.zeros((2, 12, 64), jnp.int8)
        xs = jnp.ones((2, 12, 1), jnp.float32)
        # create real params via the split path (fused path skips QDense)
        monkeypatch.setenv("THMR_FUSED_QKV", "0")
        params = att.init(jax.random.PRNGKey(0), None, residual=None,
                          x_prequant=(xq, xs))
        calls.clear()
        monkeypatch.setenv("THMR_FUSED_QKV", "1")
        att.apply(params, None, residual=None, x_prequant=(xq, xs))
        assert calls == ["fused"]
        calls.clear()
        # flag off -> split kernels
        monkeypatch.setenv("THMR_FUSED_QKV", "0")
        out = att.apply(params, None, residual=None, x_prequant=(xq, xs))
        assert calls == ["split"] and out.shape == (2, 12, 64)


class TestLnFusedQkvAttention:
    """ln_qkv_mha_q8: LN + quant + qkv + attention + q8-out in one kernel
    vs the composed reference (flax LN -> quantize_rows -> dequant matmul
    -> XLA attention)."""

    @pytest.mark.parametrize("has_bias", [False, True])
    def test_matches_composed_reference(self, has_bias):
        import flax.linen as nn
        from tokenhmr_tpu.ops import attention as A
        from tokenhmr_tpu.ops.qmatmul import quantize_cols, quantize_rows

        rng = np.random.RandomState(9)
        B, S, K, H, D = 2, 16, 32, 2, 8
        THD = 3 * H * D
        x = rng.randn(B, S, K).astype(np.float32) * 2.0
        gamma = (rng.rand(K) + 0.5).astype(np.float32)
        beta = (rng.randn(K) * 0.1).astype(np.float32)
        w = rng.randn(K, THD).astype(np.float32) * 0.1
        bias = rng.randn(THD).astype(np.float32) * 0.05
        wq, ws = quantize_cols(jnp.asarray(w))
        attn_bias = None
        if has_bias:
            attn_bias = jnp.asarray(
                np.log(rng.randint(1, 5, (B, S))).astype(np.float32))
        oq, os_ = A.ln_qkv_mha_q8(
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
            wq, ws.reshape(-1), jnp.asarray(bias), D ** -0.5, H,
            attn_bias=attn_bias, interpret=True)
        # composed reference
        y = nn.LayerNorm(epsilon=1e-6).apply(
            {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}},
            jnp.asarray(x))
        xq, xs = quantize_rows(y.reshape(-1, K))
        xd = np.asarray(xq, np.float32) * np.asarray(xs)
        wd = np.asarray(wq, np.float32) * np.asarray(ws)
        qkv = jnp.asarray(xd @ wd + bias).reshape(
            B, S, THD).astype(jnp.bfloat16).astype(jnp.float32)
        ref = A.mha_packed_xla(qkv, D ** -0.5, H, bias=attn_bias)
        deq = np.asarray(oq, np.float32) * np.asarray(os_)
        max_scale = float(np.max(np.asarray(os_)))
        np.testing.assert_allclose(deq, np.asarray(ref),
                                   atol=max_scale * 0.51 + 4e-3)


class TestAttnBlockQ8:
    """attn_block_q8 (LN+qkv+attention+proj+residual in one kernel) vs the
    composed reference path."""

    @pytest.mark.parametrize("has_bias", [False, True])
    def test_matches_composed_reference(self, has_bias):
        import flax.linen as nn
        from tokenhmr_tpu.ops import attention as A
        from tokenhmr_tpu.ops.qmatmul import quantize_cols, quantize_rows

        rng = np.random.RandomState(11)
        B, S, K, H, D = 2, 16, 32, 2, 8
        HD = H * D
        THD = 3 * HD
        x = rng.randn(B, S, K).astype(np.float32)
        res = rng.randn(B, S, K).astype(np.float32)
        gamma = (rng.rand(K) + 0.5).astype(np.float32)
        beta = (rng.randn(K) * 0.1).astype(np.float32)
        w = rng.randn(K, THD).astype(np.float32) * 0.1
        bias = rng.randn(THD).astype(np.float32) * 0.05
        wp = rng.randn(HD, K).astype(np.float32) * 0.1
        bp = rng.randn(K).astype(np.float32) * 0.05
        wq, ws = quantize_cols(jnp.asarray(w))
        wqp, wsp = quantize_cols(jnp.asarray(wp))
        attn_bias = None
        if has_bias:
            attn_bias = jnp.asarray(
                np.log(rng.randint(1, 5, (B, S))).astype(np.float32))
        out = A.attn_block_q8(
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
            wq, ws.reshape(-1), jnp.asarray(bias),
            wqp, wsp.reshape(-1), jnp.asarray(bp),
            jnp.asarray(res), D ** -0.5, H, attn_bias=attn_bias,
            interpret=True)
        assert out.shape == (B, S, K)
        # composed: the already-tested ln_qkv kernel + dequant proj matmul
        oq, os_ = A.ln_qkv_mha_q8(
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
            wq, ws.reshape(-1), jnp.asarray(bias), D ** -0.5, H,
            attn_bias=attn_bias, interpret=True)
        od = np.asarray(oq, np.float32) * np.asarray(os_)
        wpd = np.asarray(wqp, np.float32) * np.asarray(wsp)
        ref = od.reshape(-1, HD) @ wpd + bp + res.reshape(-1, K)
        np.testing.assert_allclose(np.asarray(out, np.float32).reshape(-1, K),
                                   ref, atol=5e-2, rtol=1e-2)


class TestScanBlockFusedDispatch:
    """_ScanViTBlock routes norm1+attention through the LN-fused kernel on
    TPU (qln) and stays on the plain path on CPU — wiring test with the
    backend and kernels stubbed."""

    def test_ln_fused_wiring(self, monkeypatch):
        from tokenhmr_tpu.models import vit as V

        calls = []

        def fake_fused(self, x_prequant, residual, attn_bias, scale,
                       ln_raw=None):
            calls.append("ln_raw" if ln_raw is not None else "prequant")
            src = ln_raw[0] if ln_raw is not None else x_prequant[0]
            return jnp.zeros(src.shape[:-1] + (self.cfg.embed_dim,),
                             jnp.float32)

        monkeypatch.setattr(V.ViTAttention, "_fused_qkv_attention",
                            fake_fused)
        monkeypatch.setattr(V.jax, "default_backend", lambda: "tpu")
        monkeypatch.setenv("THMR_FUSED_LN", "1")
        # fc1 static scales absent -> ViTMlp takes its LN fallback (pure
        # XLA), so only the attention half needs stubbing
        monkeypatch.setenv("THMR_FUSED_LN_MLP", "1")
        cfg = V.ViTConfig(img_size=(64, 48), embed_dim=64, depth=1,
                          num_heads=4, dtype=jnp.float32, quant="int8",
                          attn_impl="pallas")
        blk = V._ScanViTBlock(cfg, deterministic=True)
        x = jnp.zeros((2, 12, 64))
        params = blk.init(jax.random.PRNGKey(0), x, jnp.zeros(()))
        calls.clear()
        out, _ = blk.apply(params, x, jnp.zeros(()))
        assert calls == ["ln_raw"]
        assert out.shape == (2, 12, 64)

    def test_cpu_stays_unfused(self, monkeypatch):
        from tokenhmr_tpu.models import vit as V

        called = []
        monkeypatch.setattr(
            V.ViTAttention, "_fused_qkv_attention",
            lambda self, *a, **k: called.append(1) or jnp.zeros(()))
        cfg = V.ViTConfig(img_size=(64, 48), embed_dim=64, depth=1,
                          num_heads=4, dtype=jnp.float32, quant="int8")
        blk = V._ScanViTBlock(cfg, deterministic=True)
        x = jnp.zeros((2, 12, 64))
        params = blk.init(jax.random.PRNGKey(0), x, jnp.zeros(()))
        out, _ = blk.apply(params, x, jnp.zeros(()))
        assert not called and out.shape == (2, 12, 64)


class TestTokenLossObjectives:
    def test_logp_equals_standard_ce_on_logits(self):
        """-log(softmax(z)_gt) through the simplex == CE on the logits."""
        from tokenhmr_tpu.train.losses import token_loss

        rng = np.random.RandomState(0)
        z = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
        gt = jnp.asarray(rng.randint(0, 16, (2, 5)))
        p = jax.nn.softmax(z, axis=-1)
        got = token_loss(p, gt, objective="logp")
        want = -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(z, -1), gt[..., None], -1))
        assert abs(float(got) - float(want)) < 1e-5

    def test_parity_objective_gradient_is_tiny(self):
        """The reference's double-softmax quirk: near-uniform simplex ->
        parity CE pinned at ln(K) with ~1e-3x the logp gradient (why the
        r4 run's token CE sat at 7.625 until the objective switch)."""
        from tokenhmr_tpu.train.losses import token_loss

        rng = np.random.RandomState(1)
        z = jnp.asarray(rng.randn(2, 5, 64).astype(np.float32) * 0.1)
        gt = jnp.asarray(rng.randint(0, 64, (2, 5)))

        def f(obj):
            return lambda zz: token_loss(
                jax.nn.softmax(zz, -1), gt, objective=obj)

        g_par = jnp.linalg.norm(jax.grad(f("parity"))(z))
        g_std = jnp.linalg.norm(jax.grad(f("logp"))(z))
        assert float(f("parity")(z)) == pytest.approx(np.log(64), abs=1e-2)
        assert float(g_par) < 0.05 * float(g_std)
