"""SMPLify-Inv + VPoser decoder tests."""
import numpy as np
import jax
import jax.numpy as jnp

from tokenhmr_tpu.models import smpl as S
from tokenhmr_tpu.ops.projection import perspective_projection
from tokenhmr_tpu.ops.rotations import matrix_to_rotation_6d
from tokenhmr_tpu.utils import fitting as FT


class TestSmplifyInvert:
    def test_optimization_moves_toward_2d_away_from_3d(self):
        model = S.synthetic_smpl_model(num_vertices=200, num_joints=24)
        B = 2
        eye6 = matrix_to_rotation_6d(jnp.broadcast_to(jnp.eye(3), (B, 24, 3, 3)))
        betas = jnp.zeros((B, 10))
        cam_t = jnp.tile(jnp.array([[0.0, 0.0, 10.0]]), (B, 1))

        # target 2D: projection of a DIFFERENT pose; target 3D: the identity's joints
        rng = np.random.RandomState(0)
        target_pose = eye6 + jnp.asarray(rng.randn(B, 24, 6).astype(np.float32) * 0.1)
        from tokenhmr_tpu.ops.rotations import rotation_6d_to_matrix
        rm = rotation_6d_to_matrix(target_pose)
        tgt = S.smpl_openpose_forward(model, betas, rm[:, :1], rm[:, 1:])
        focal = jnp.full((B, 2), 5000.0)
        tgt2d = perspective_projection(tgt["joints"], cam_t, focal / 256.0)
        joints2d = jnp.concatenate([tgt2d, jnp.ones((B, 44, 1))], -1)

        init = S.smpl_openpose_forward(
            model, betas, jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)),
            jnp.broadcast_to(jnp.eye(3), (B, 23, 3, 3)))
        fit0 = FT.camera_fitting_loss(init["joints"], cam_t, focal, joints2d)

        out = FT.smplify_invert(
            model, eye6, betas, cam_t, joints2d, init["joints"],
            FT.SMPLifyInvConfig(num_iters=50, step_size=5e-3),
        )
        fit1 = FT.camera_fitting_loss(out["joints"], out["cam_t"], focal, joints2d)
        # 2D fit improves; 3D moved away from the init joints
        assert float(fit1) < float(fit0)
        push = float(jnp.mean(jnp.linalg.norm(out["joints"] - init["joints"], axis=-1)))
        assert push > 1e-3
        assert np.isfinite(float(out["final_loss"]))


class TestVPoser:
    def test_decoder_shapes_and_validity(self):
        dec = FT.VPoserDecoder()
        z = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
        params = dec.init(jax.random.PRNGKey(1), z)
        out = dec.apply(params, z)
        assert out.shape == (4, 126)
        from tokenhmr_tpu.ops.rotations import rotation_6d_to_matrix
        rm = rotation_6d_to_matrix(out.reshape(4, 21, 6))
        np.testing.assert_allclose(np.linalg.det(np.asarray(rm)), 1.0, atol=1e-4)

    def test_sample(self):
        dec = FT.VPoserDecoder()
        z = jnp.zeros((2, 32))
        params = dec.init(jax.random.PRNGKey(0), z)
        out = FT.sample_vposer(params, jnp.zeros((2, 32)), jnp.zeros((2, 32)),
                               jax.random.PRNGKey(2))
        assert out.shape == (2, 126)

    def test_converter_structure(self, tmp_path):
        import torch

        sd = {
            "vp_model.decoder_net.0.weight": torch.randn(512, 32),
            "vp_model.decoder_net.0.bias": torch.randn(512),
            "vp_model.decoder_net.3.weight": torch.randn(512, 512),
            "vp_model.decoder_net.3.bias": torch.randn(512),
            "vp_model.decoder_net.5.weight": torch.randn(126, 512),
            "vp_model.decoder_net.5.bias": torch.randn(126),
        }
        path = str(tmp_path / "vposer.ckpt")
        torch.save({"state_dict": sd}, path)
        params = FT.convert_vposer_checkpoint(path)
        out = FT.VPoserDecoder().apply(params, jnp.zeros((1, 32)))
        assert out.shape == (1, 126)
