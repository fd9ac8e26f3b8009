"""Procedural humanoid body model + on-device synthetic crop generator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhmr_tpu.data.synth_crops import (SynthConfig, make_synth_batch_fn,
                                           sample_pose)
from tokenhmr_tpu.models.humanoid import (SMPL_PARENTS, _TPOSE,
                                          humanoid_smpl_model,
                                          humanoid_smplh_model)


@pytest.fixture(scope="module")
def model():
    return humanoid_smpl_model(num_vertices=2000)


class TestHumanoid:
    def test_structure(self, model):
        V = 2000
        assert model.v_template.shape == (V, 3)
        assert model.lbs_weights.shape == (V, 24)
        np.testing.assert_allclose(
            np.asarray(model.lbs_weights).sum(1), 1.0, atol=1e-5)
        assert np.asarray(model.faces).max() < V
        np.testing.assert_array_equal(model.parents, SMPL_PARENTS)

    def test_joint_regressor_anchors_tpose(self, model):
        """Regressed joints land near the anthropometric anchors."""
        jr = np.asarray(model.J_regressor @ model.v_template)
        err = np.linalg.norm(jr - _TPOSE, axis=1)
        assert err.max() < 0.08, err

    def test_human_proportions(self, model):
        v = np.asarray(model.v_template)
        height = v[:, 1].max() - v[:, 1].min()
        assert 1.5 < height < 2.0                      # ~1.7 m figure
        span = v[:, 0].max() - v[:, 0].min()
        assert 1.3 < span < 1.9                        # T-pose arm span

    def test_lbs_moves_the_right_limb(self, model):
        """Bending the left elbow moves left-forearm verts, not the legs."""
        from tokenhmr_tpu.models.smpl import smpl_forward
        from tokenhmr_tpu.ops.rotations import axis_angle_to_matrix

        eye = jnp.broadcast_to(jnp.eye(3), (1, 23, 3, 3))
        go = jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3))
        rest = smpl_forward(model, jnp.zeros((1, 10)), go, eye)["vertices"]
        aa = jnp.zeros((1, 23, 3)).at[0, 17, 2].set(1.2)  # l_elbow (joint 18)
        bent = smpl_forward(model, jnp.zeros((1, 10)), go,
                            axis_angle_to_matrix(aa))["vertices"]
        moved = np.linalg.norm(np.asarray(bent - rest)[0], axis=1)
        part = np.asarray(jnp.argmax(model.lbs_weights, 1))
        assert moved[part == 18].max() > 0.05           # forearm moved
        assert moved[part == 4].max() < 1e-4            # left thigh didn't

    def test_shapedirs_change_height(self, model):
        from tokenhmr_tpu.models.smpl import smpl_forward

        eye = jnp.broadcast_to(jnp.eye(3), (1, 23, 3, 3))
        go = jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3))
        tall = smpl_forward(model, jnp.zeros((1, 10)).at[0, 0].set(2.0),
                            go, eye)["vertices"]
        short = smpl_forward(model, jnp.zeros((1, 10)).at[0, 0].set(-2.0),
                            go, eye)["vertices"]
        h = lambda v: float(v[0, :, 1].max() - v[0, :, 1].min())
        assert h(tall) > h(short) * 1.1

    def test_smplh_variant(self):
        m = humanoid_smplh_model(num_vertices=1500)
        assert m.lbs_weights.shape == (1500, 52)
        np.testing.assert_allclose(
            np.asarray(m.lbs_weights).sum(1), 1.0, atol=1e-5)
        p = m.parents
        assert p[22] == 20 and p[37] == 21              # fingers on wrists
        assert all(p[j] < j for j in range(1, 52))      # topological order


class TestSynthCrops:
    def test_pose_prior_bounded(self):
        p = sample_pose(jax.random.PRNGKey(0), 64)
        assert p["body_pose"].shape == (64, 23, 3, 3)
        # rotmats are orthonormal
        rtr = np.asarray(p["body_pose"] @ np.swapaxes(p["body_pose"], -1, -2))
        np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape),
                                   atol=1e-5)
        assert p["cam"][:, 0].min() > 0.5               # positive scale

    def test_batch_contract_and_determinism(self, model):
        fn = jax.jit(make_synth_batch_fn(
            model, SynthConfig(height=64, width=48, normalize=False)),
            static_argnums=1)
        b = fn(jax.random.PRNGKey(3), 3)
        assert b["img"].shape == (3, 64, 48, 3)
        assert b["keypoints_2d"].shape == (3, 44, 3)
        assert b["keypoints_3d"].shape == (3, 44, 4)
        img = np.asarray(b["img"])
        assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1
        # determinism: same key -> same batch
        b2 = fn(jax.random.PRNGKey(3), 3)
        np.testing.assert_array_equal(img, np.asarray(b2["img"]))
        b3 = fn(jax.random.PRNGKey(4), 3)
        assert not np.allclose(img, np.asarray(b3["img"]))

    def test_person_is_rendered_upright_and_visible(self, model):
        """The splat renderer actually draws the body: foreground pixels
        differ from the background and keypoints project inside the crop."""
        fn = jax.jit(make_synth_batch_fn(
            model, SynthConfig(normalize=False)), static_argnums=1)
        b = fn(jax.random.PRNGKey(7), 2)
        img = np.asarray(b["img"])
        # center strip should contain body pixels: higher variance than a
        # pure gradient background
        strip = img[:, 64:192, 48:144]
        assert strip.std() > 0.05
        kp = np.asarray(b["keypoints_2d"])[..., :2]
        assert (np.abs(kp) < 0.75).mean() > 0.95
