"""PoseVQ tokenizer tests: shapes, quantizer semantics, round trips."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokenhmr_tpu.models import posevq as PQ


@pytest.fixture(scope="module")
def cfg():
    # release architecture but narrow for speed
    return PQ.PoseVQConfig(code_dim=32, nb_code=64, width=64, depth=2)


@pytest.fixture(scope="module")
def params(cfg):
    model = PQ.PoseVQ(cfg)
    x = jnp.zeros((2, 21, 6))
    return model.init(jax.random.PRNGKey(0), x)


class TestArchitecture:
    def test_num_tokens_release_config(self):
        assert PQ.PoseVQConfig().num_tokens == 160  # ref formula, SURVEY §2.2

    def test_encoder_shape(self, cfg, params):
        model = PQ.PoseVQ(cfg)
        z = model.apply(params, jnp.zeros((3, 21, 6)), method=PQ.PoseVQ.encode_latents)
        assert z.shape == (3, cfg.num_tokens, cfg.code_dim)

    def test_decoder_shape(self, cfg, params):
        model = PQ.PoseVQ(cfg)
        out = model.apply(
            params, jnp.zeros((3, cfg.num_tokens, cfg.code_dim)),
            method=PQ.PoseVQ.decode_latents,
        )
        assert out.shape == (3, 21, 6)

    def test_nearest_resize_matches_torch_semantics(self):
        # torch nearest: out[i] = in[floor(i * T_in / T_out)]
        x = jnp.arange(7.0)[None, :, None]
        up = PQ.nearest_resize_1d(x, 10)
        expected = [np.floor(i * 7 / 10) for i in range(10)]
        np.testing.assert_allclose(np.asarray(up)[0, :, 0], expected)
        down = PQ.nearest_resize_1d(x, 3)
        np.testing.assert_allclose(np.asarray(down)[0, :, 0], [0, 2, 4])


class TestQuantizer:
    def test_init_from_first_batch(self, cfg):
        state = PQ.vq_init_state(cfg)
        assert not bool(state.initialized)
        x = jax.random.normal(jax.random.PRNGKey(1), (128, cfg.code_dim))
        _, _, _, new_state = PQ.vq_ema_reset_forward(state, x, jax.random.PRNGKey(2))
        assert bool(new_state.initialized)
        assert not np.allclose(np.asarray(new_state.codebook), 0.0)

    def test_quantize_is_nearest(self, cfg):
        codebook = jax.random.normal(jax.random.PRNGKey(3), (cfg.nb_code, cfg.code_dim))
        x = codebook[5:10] + 1e-4
        idx = np.asarray(PQ.vq_quantize(codebook, x))
        np.testing.assert_array_equal(idx, [5, 6, 7, 8, 9])

    def test_straight_through_gradient(self, cfg):
        state = PQ.vq_init_state(cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (256, cfg.code_dim))
        _, _, _, state = PQ.vq_ema_reset_forward(state, x, jax.random.PRNGKey(5))

        def f(x):
            xq, _, _, _ = PQ.vq_ema_reset_forward(state, x, jax.random.PRNGKey(6))
            return jnp.sum(xq * 2.0)

        g = jax.grad(f)(x)
        # straight-through: dL/dx == dL/dxq == 2
        np.testing.assert_allclose(np.asarray(g), 2.0, atol=1e-6)

    def test_ema_moves_codebook_toward_data(self, cfg):
        state = PQ.vq_init_state(cfg)
        key = jax.random.PRNGKey(7)
        target = jax.random.normal(key, (cfg.nb_code, cfg.code_dim))
        # repeatedly quantize clean samples of the codes themselves
        for i in range(5):
            x = jnp.tile(target, (4, 1))
            _, commit, perp, state = PQ.vq_ema_reset_forward(
                state, x, jax.random.PRNGKey(10 + i)
            )
        # commit loss should shrink as codebook converges
        _, final_commit, final_perp, _ = PQ.vq_ema_reset_forward(
            state, jnp.tile(target, (4, 1)), jax.random.PRNGKey(99)
        )
        assert float(final_commit) < 0.05
        assert float(final_perp) > cfg.nb_code * 0.5  # most codes used

    def test_eval_mode_keeps_state(self, cfg):
        state = PQ.vq_init_state(cfg)
        x = jax.random.normal(jax.random.PRNGKey(8), (128, cfg.code_dim))
        _, _, _, state = PQ.vq_ema_reset_forward(state, x, jax.random.PRNGKey(9))
        _, _, _, state2 = PQ.vq_ema_reset_forward(
            state, x * 3, jax.random.PRNGKey(10), training=False
        )
        np.testing.assert_array_equal(np.asarray(state.codebook), np.asarray(state2.codebook))

    def test_dequantize_logits_soft_path(self, cfg):
        codebook = jax.random.normal(jax.random.PRNGKey(11), (cfg.nb_code, cfg.code_dim))
        # one-hot logits pick exact codes
        onehot = jax.nn.one_hot(jnp.array([3, 17]), cfg.nb_code)
        out = PQ.vq_dequantize_logits(codebook, onehot)
        np.testing.assert_allclose(np.asarray(out), np.asarray(codebook[jnp.array([3, 17])]), atol=1e-6)

    def test_jit_forward(self, cfg):
        state = PQ.vq_init_state(cfg)
        x = jax.random.normal(jax.random.PRNGKey(12), (128, cfg.code_dim))
        f = jax.jit(PQ.vq_ema_reset_forward, static_argnames=("mu", "training"))
        xq, c, p, s = f(state, x, jax.random.PRNGKey(13))
        assert xq.shape == x.shape


class TestEndToEnd:
    def test_train_forward_and_roundtrip(self, cfg, params):
        state = PQ.vq_init_state(cfg)
        pose = jax.random.normal(jax.random.PRNGKey(14), (4, 21, 6)) * 0.3
        pred, commit, perp, state = PQ.posevq_forward_train(
            params, cfg, state, pose, jax.random.PRNGKey(15)
        )
        assert pred.shape == (4, 21, 6)
        assert np.isfinite(float(commit))

        # encode -> indices -> decode path
        idx = PQ.posevq_encode(params, cfg, state, pose)
        assert idx.shape == (4, cfg.num_tokens)
        dec = PQ.posevq_decode_indices(params, cfg, state, idx)
        assert dec.shape == (4, 21, 6)

        # softmax-logits decode path (TokenHMR head contract)
        logits = jax.nn.softmax(
            jax.random.normal(jax.random.PRNGKey(16), (4, cfg.num_tokens, cfg.nb_code)), -1
        )
        dec2 = PQ.posevq_decode_logits(params, cfg, state, logits)
        assert dec2.shape == (4, 21, 6)

    def test_training_gradient_through_encoder(self, cfg, params):
        state = PQ.vq_init_state(cfg)
        pose = jax.random.normal(jax.random.PRNGKey(17), (4, 21, 6)) * 0.3
        _, _, _, state = PQ.posevq_forward_train(
            params, cfg, state, pose, jax.random.PRNGKey(18)
        )

        def loss_fn(p):
            pred, commit, _, _ = PQ.posevq_forward_train(
                p, cfg, state, pose, jax.random.PRNGKey(19)
            )
            return jnp.mean((pred - pose) ** 2) + commit

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # encoder gets gradient through the straight-through path
        enc_leaves = jax.tree_util.tree_leaves(g["params"]["encoder"])
        assert any(float(jnp.abs(l).max()) > 0 for l in enc_leaves)

    def test_noise_curriculum(self):
        pose = jnp.zeros((8, 21, 6))
        noised = PQ.add_noise_curriculum(pose, jax.random.PRNGKey(20), step=30000)
        assert noised.shape == pose.shape
        assert float(jnp.abs(noised).max()) > 0  # some joints perturbed
        clean_frac = float(jnp.mean((noised == 0).astype(jnp.float32)))
        assert clean_frac > 0.3  # most entries untouched


class TestQuantizerVariants:
    def test_learned_quantizer(self, cfg):
        codebook = jax.random.normal(jax.random.PRNGKey(0), (cfg.nb_code, cfg.code_dim))
        x = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.code_dim))
        xq, loss, perp = PQ.vq_learned_forward(codebook, x, beta=1.0)
        assert xq.shape == x.shape and np.isfinite(float(loss))
        # codebook receives gradient (unlike EMA variants)
        g = jax.grad(lambda cb: PQ.vq_learned_forward(cb, x)[1])(codebook)
        assert float(jnp.abs(g).max()) > 0

    def test_ema_variant(self, cfg):
        state = PQ.vq_init_state(cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (128, cfg.code_dim))
        xq, commit, perp, state = PQ.vq_ema_forward(state, x, jax.random.PRNGKey(3))
        assert bool(state.initialized)
        xq2, _, _, state2 = PQ.vq_ema_forward(state, x, jax.random.PRNGKey(4))
        assert not np.allclose(np.asarray(state.codebook), np.asarray(state2.codebook))

    def test_reset_variant(self, cfg):
        state = PQ.vq_init_state(cfg)
        x = jax.random.normal(jax.random.PRNGKey(5), (128, cfg.code_dim))
        xq, commit, perp, state = PQ.vq_reset_forward(state, x, jax.random.PRNGKey(6))
        assert xq.shape == x.shape and np.isfinite(float(commit))

    def test_registry(self):
        assert set(PQ.QUANTIZER_FORWARDS) == {"ema_reset", "ema", "reset"}


class TestQuantizerCLIVariants:
    """VERDICT r1 #7: each ARCH.QUANTIZER variant reachable from the CLI
    (ref option_posevq.py:50-68) and converging on a tiny synthetic run."""

    @pytest.mark.parametrize("variant", ["ema_reset", "ema", "reset", "orig"])
    def test_cli_convergence_smoke(self, variant, tmp_path):
        import json
        from cli.train_tokenizer import main
        out = tmp_path / variant
        main(["--synthetic", "--tiny", "--platform", "cpu",
              "--quantizer", variant, "--out-dir", str(out),
              "--total-iters", "12", "--eval-iters", "6",
              "--print-iters", "50", "--batch-size", "16"])
        best = json.loads((out / "best.json").read_text())
        assert np.isfinite(best["score"]) and best["score"] > 0
        assert np.isfinite(best["perplexity"])

    def test_eval_only_mode(self, tmp_path):
        """--eval-only restores the latest ckpt and dumps eval_results.json
        (ref train_poseVQ.py eval mode / eval_poseVQ.py results dump)."""
        import json
        from cli.train_tokenizer import main
        out = tmp_path / "evalonly"
        main(["--synthetic", "--tiny", "--platform", "cpu",
              "--out-dir", str(out), "--total-iters", "6",
              "--eval-iters", "6", "--print-iters", "50",
              "--batch-size", "16"])
        main(["--synthetic", "--tiny", "--platform", "cpu",
              "--out-dir", str(out), "--eval-only", "--batch-size", "16"])
        res = json.loads((out / "eval_results.json").read_text())
        assert res["step"] == 6
        assert np.isfinite(res["score"]) and res["score"] > 0
