"""Multi-device SPMD tests on the virtual 8-device CPU mesh
(SURVEY §4d — the fake-backend distributed test the reference lacks)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokenhmr_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings, replicated, shard_params,
)


class TestMesh:
    def test_factorizations(self):
        assert dict(make_mesh().shape) == {"data": 8, "fsdp": 1, "model": 1}
        assert dict(make_mesh(n_fsdp=2).shape) == {"data": 4, "fsdp": 2, "model": 1}
        assert dict(make_mesh(n_fsdp=2, n_model=2).shape) == {
            "data": 2, "fsdp": 2, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(n_data=3, n_fsdp=3)
        with pytest.raises(ValueError, match="factorize"):
            make_mesh(n_fsdp=3)  # 3 does not divide 8

    def test_tp_rules_must_match(self):
        # a renamed tree (no vit-block path fragments) with model>1 must
        # fail loudly instead of silently replicating everything
        from tokenhmr_tpu.parallel.mesh import param_shardings
        mesh = make_mesh(n_model=2)
        params = {"encoder": {"layer0": {"w": jnp.zeros((256, 1024))}}}
        with pytest.raises(ValueError, match="TP rules matched 0"):
            param_shardings(params, mesh)

    def test_param_sharding_rules(self):
        mesh = make_mesh(n_fsdp=2, n_model=2)
        params = {
            "backbone": {
                "blocks": {
                    "mlp": {"fc1": {"kernel": jnp.zeros((4, 64, 256))}},
                    "attn": {"qkv": {"kernel": jnp.zeros((4, 64, 192))}},
                },
            },
            "head": {"decshape": {"kernel": jnp.zeros((64, 10))}},
        }
        sh = param_shardings(params, mesh)
        fc1 = sh["backbone"]["blocks"]["mlp"]["fc1"]["kernel"].spec
        qkv = sh["backbone"]["blocks"]["attn"]["qkv"]["kernel"].spec
        assert fc1[-1] == "model" and qkv[-1] == "model"
        # small head params stay replicated (size gate)
        assert all(s is None for s in sh["head"]["decshape"]["kernel"].spec)

    def test_dp_grad_allreduce_matches_single_device(self):
        """A data-sharded loss grad equals the unsharded grad."""
        mesh = make_mesh()  # pure data
        w = jnp.asarray(np.random.RandomState(0).randn(16, 16).astype(np.float32))
        x = jnp.asarray(np.random.RandomState(1).randn(32, 16).astype(np.float32))

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        g_ref = jax.grad(loss)(w, x)
        with jax.set_mesh(mesh):
            xs = jax.device_put(x, batch_sharding(mesh))
            ws = jax.device_put(w, replicated(mesh))
            g_sharded = jax.jit(jax.grad(loss))(ws, xs)
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_sharded),
                                   rtol=1e-5)

    def test_tiny_train_step_on_mesh(self):
        """Full TALS train step over a 2x2x2 mesh == dryrun path."""
        import __graft_entry__ as G

        G.dryrun_multichip(8)  # raises on failure


class TestEntry:
    def test_entry_compiles_tiny_equivalent(self):
        """entry() contract shape-check via the tiny flagship (full-size
        compile is the driver's job on real hardware)."""
        import __graft_entry__ as G
        from tokenhmr_tpu.models.tokenhmr import forward_step

        cfg, frozen, smpl_model, params, img = G._flagship(batch_size=1, tiny=True)
        out = jax.jit(
            lambda p, i: forward_step(p, frozen, cfg, smpl_model, i)
        )(params, img)
        assert out["pred_vertices"].shape[0] == 1
