"""Property + golden tests for the rotations library."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokenhmr_tpu.ops import rotations as R


def _rand_rotmats(n, seed=0):
    return np.asarray(R.random_rotations(jax.random.PRNGKey(seed), n))


class TestQuaternion:
    def test_quat_matrix_roundtrip(self):
        q = np.asarray(R.random_quaternions(jax.random.PRNGKey(1), 256))
        m = R.quaternion_to_matrix(jnp.asarray(q))
        q2 = np.asarray(R.matrix_to_quaternion(m))
        np.testing.assert_allclose(np.abs(np.sum(q * q2, axis=-1)), 1.0, atol=1e-5)

    def test_matrix_is_rotation(self):
        m = np.asarray(R.quaternion_to_matrix(R.random_quaternions(jax.random.PRNGKey(2), 64)))
        eye = np.einsum("bij,bkj->bik", m, m)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)

    def test_identity(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(np.asarray(R.quaternion_to_matrix(q))[0], np.eye(3), atol=1e-7)

    def test_near_pi_rotation(self):
        # 180-degree rotations are the hard case for matrix->quat
        for axis in np.eye(3):
            aa = jnp.asarray((np.pi - 1e-5) * axis)[None]
            m = R.axis_angle_to_matrix(aa)
            aa2 = np.asarray(R.matrix_to_axis_angle(m))
            np.testing.assert_allclose(np.asarray(aa), aa2, atol=1e-4)


class TestAxisAngle:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        aa = rng.randn(512, 3).astype(np.float32)
        aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * rng.uniform(0, np.pi - 0.05, (512, 1))
        m = R.axis_angle_to_matrix(jnp.asarray(aa))
        aa2 = np.asarray(R.matrix_to_axis_angle(m))
        np.testing.assert_allclose(aa, aa2, atol=1e-4)

    def test_zero_angle(self):
        m = np.asarray(R.axis_angle_to_matrix(jnp.zeros((4, 3))))
        np.testing.assert_allclose(m, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-7)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda a: jnp.sum(R.axis_angle_to_matrix(a)))(jnp.zeros(3) + 1e-9)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_rodrigues_golden(self):
        # axis-angle about z by 90 degrees
        aa = jnp.array([[0.0, 0.0, np.pi / 2]])
        m = np.asarray(R.axis_angle_to_matrix(aa))[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(m, expected, atol=1e-6)

    def test_cv2_rodrigues_golden(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.RandomState(3)
        for _ in range(16):
            aa = rng.randn(3).astype(np.float64)
            expected, _ = cv2.Rodrigues(aa)
            got = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa[None], dtype=jnp.float32)))[0]
            np.testing.assert_allclose(got, expected, atol=1e-5)


class TestRot6D:
    def test_roundtrip_tokenhmr(self):
        m = _rand_rotmats(256)
        six = R.matrix_to_rotation_6d(jnp.asarray(m))
        m2 = np.asarray(R.rotation_6d_to_matrix(six))
        np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_roundtrip_hmr2(self):
        m = _rand_rotmats(64, seed=5)
        six = R.matrix_to_rotation_6d(jnp.asarray(m), convention="hmr2")
        m2 = np.asarray(R.rotation_6d_to_matrix(six, convention="hmr2"))
        np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_conventions_differ(self):
        x = jnp.asarray(np.random.RandomState(1).randn(8, 6).astype(np.float32))
        a = np.asarray(R.rotation_6d_to_matrix(x, convention="tokenhmr"))
        b = np.asarray(R.rotation_6d_to_matrix(x, convention="hmr2"))
        assert not np.allclose(a, b, atol=1e-3)
        # but they are transposes of each other
        np.testing.assert_allclose(a, np.swapaxes(b, -1, -2), atol=1e-5)

    def test_torch_reference_semantics(self):
        """Golden parity with the exact reference algorithm, re-derived in numpy."""
        rng = np.random.RandomState(7)
        x = rng.randn(32, 6).astype(np.float32)
        # reference math (geometry.py:68-84): a1 = x[0:3], a2 = x[3:6] after
        # reshape(-1,2,3).permute(0,2,1) column slicing
        a1, a2 = x[:, 0:3], x[:, 3:6]
        b1 = a1 / np.linalg.norm(a1, axis=-1, keepdims=True)
        a2p = a2 - np.sum(b1 * a2, axis=-1, keepdims=True) * b1
        b2 = a2p / np.linalg.norm(a2p, axis=-1, keepdims=True)
        b3 = np.cross(b1, b2)
        expected = np.stack([b1, b2, b3], axis=-2)
        got = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_output_is_rotation(self):
        x = jnp.asarray(np.random.RandomState(2).randn(64, 6).astype(np.float32))
        m = np.asarray(R.rotation_6d_to_matrix(x))
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)

    def test_bf16_input(self):
        m = _rand_rotmats(16)
        six = R.matrix_to_rotation_6d(jnp.asarray(m)).astype(jnp.bfloat16)
        m2 = np.asarray(R.rotation_6d_to_matrix(six)).astype(np.float32)
        np.testing.assert_allclose(m, m2, atol=2e-2)


class TestEuler:
    def test_roundtrip_xyz(self):
        rng = np.random.RandomState(0)
        e = rng.uniform(-1.2, 1.2, (64, 3)).astype(np.float32)
        m = R.euler_angles_to_matrix(jnp.asarray(e), "XYZ")
        e2 = np.asarray(R.matrix_to_euler_angles(m, "XYZ"))
        np.testing.assert_allclose(e, e2, atol=1e-4)

    def test_roundtrip_zyx(self):
        rng = np.random.RandomState(1)
        e = rng.uniform(-1.2, 1.2, (64, 3)).astype(np.float32)
        m = R.euler_angles_to_matrix(jnp.asarray(e), "ZYX")
        e2 = np.asarray(R.matrix_to_euler_angles(m, "ZYX"))
        np.testing.assert_allclose(e, e2, atol=1e-4)


class TestAngles:
    def test_relative_angle(self):
        aa = jnp.array([[0.3, 0.0, 0.0]])
        m1 = R.axis_angle_to_matrix(aa)
        m2 = R.axis_angle_to_matrix(2 * aa)
        ang = np.asarray(R.so3_relative_angle(m1, m2))
        np.testing.assert_allclose(ang, [0.3], atol=1e-4)

    def test_joint_angle_error_matches_geodesic(self):
        m1 = jnp.asarray(_rand_rotmats(8).reshape(2, 4, 3, 3))
        m2 = jnp.asarray(_rand_rotmats(8, seed=9).reshape(2, 4, 3, 3))
        jae = np.asarray(R.joint_angle_error(m1, m2))
        rel = np.asarray(R.so3_relative_angle(m1.reshape(-1, 3, 3), m2.reshape(-1, 3, 3))).reshape(2, 4)
        np.testing.assert_allclose(jae, rel, atol=1e-3)

    def test_acos_linear_extrapolation(self):
        x = jnp.linspace(-1.2, 1.2, 101)
        y = np.asarray(R.acos_linear_extrapolation(x))
        assert np.all(np.isfinite(y))
        inner = np.abs(np.asarray(x)) < 0.99
        np.testing.assert_allclose(y[inner], np.arccos(np.asarray(x)[inner]), atol=1e-5)
        g = jax.vmap(jax.grad(lambda v: R.acos_linear_extrapolation(v)))(x)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_jit_and_vmap(self):
        m = jnp.asarray(_rand_rotmats(8))
        f = jax.jit(R.matrix_to_axis_angle)
        np.testing.assert_allclose(np.asarray(f(m)), np.asarray(R.matrix_to_axis_angle(m)), atol=1e-6)
