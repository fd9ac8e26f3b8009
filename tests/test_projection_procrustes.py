"""Tests for perspective projection, weak-perspective cam, Procrustes."""
import numpy as np
import jax
import jax.numpy as jnp

from tokenhmr_tpu.ops import projection as P
from tokenhmr_tpu.ops import procrustes as PR
from tokenhmr_tpu.ops import rotations as R


class TestProjection:
    def test_pinhole_center_point(self):
        pts = jnp.zeros((1, 1, 3))
        t = jnp.array([[0.0, 0.0, 5.0]])
        f = jnp.array([[1000.0, 1000.0]])
        out = np.asarray(P.perspective_projection(pts, t, f))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_known_offset(self):
        pts = jnp.array([[[1.0, 2.0, 0.0]]])
        t = jnp.array([[0.0, 0.0, 10.0]])
        f = jnp.array([[100.0, 100.0]])
        out = np.asarray(P.perspective_projection(pts, t, f))[0, 0]
        np.testing.assert_allclose(out, [10.0, 20.0], atol=1e-5)

    def test_camera_center_and_rotation(self):
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
        t = jnp.asarray(np.array([[0, 0, 8], [0.2, -0.1, 6]], dtype=np.float32))
        f = jnp.full((2, 2), 500.0)
        cc = jnp.asarray(np.array([[128, 96], [64, 48]], dtype=np.float32))
        rot = R.axis_angle_to_matrix(jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.1))
        out = np.asarray(P.perspective_projection(pts, t, f, camera_center=cc, rotation=rot))
        # manual reference
        p = np.einsum("bij,bkj->bki", np.asarray(rot), np.asarray(pts)) + np.asarray(t)[:, None]
        exp = p[..., :2] / p[..., 2:3] * 500.0 + np.asarray(cc)[:, None]
        np.testing.assert_allclose(out, exp, atol=1e-4)

    def test_weak_perspective_translation(self):
        cam = jnp.array([[0.8, 0.1, -0.2]])
        f = jnp.full((1, 2), 5000.0)
        t = np.asarray(P.weak_perspective_to_translation(cam, f, 256.0))
        np.testing.assert_allclose(t[0, :2], [0.1, -0.2], atol=1e-6)
        np.testing.assert_allclose(t[0, 2], 2 * 5000.0 / (256.0 * 0.8 + 1e-9), rtol=1e-6)

    def test_cam_crop_to_full_identity_box(self):
        # box covering the whole image centered => tx,ty == crop cam tx,ty
        cam = jnp.array([[1.0, 0.3, -0.4]])
        center = jnp.array([[100.0, 80.0]])
        size = jnp.array([200.0])
        img = jnp.array([[200.0, 160.0]])
        out = np.asarray(P.cam_crop_to_full(cam, center, size, img))
        np.testing.assert_allclose(out[0, 0], 0.3, atol=1e-5)
        np.testing.assert_allclose(out[0, 1], -0.4, atol=1e-5)
        np.testing.assert_allclose(out[0, 2], 2 * 5000.0 / 200.0, rtol=1e-5)


class TestProcrustes:
    def _random_cloud(self, b=4, n=24, seed=0):
        return np.random.RandomState(seed).randn(b, n, 3).astype(np.float32)

    def test_exact_recovery(self):
        """S1 differing from S2 by a known similarity transform aligns exactly."""
        S2 = self._random_cloud()
        rot = np.asarray(R.random_rotations(jax.random.PRNGKey(0), 4))
        scale = np.array([0.5, 1.5, 2.0, 0.9], dtype=np.float32)[:, None, None]
        t = np.random.RandomState(1).randn(4, 1, 3).astype(np.float32)
        S1 = np.einsum("bij,bnj->bni", np.swapaxes(rot, -1, -2), (S2 - t) / scale)
        aligned = np.asarray(PR.compute_similarity_transform(jnp.asarray(S1), jnp.asarray(S2)))
        np.testing.assert_allclose(aligned, S2, atol=1e-4)

    def test_numpy_svd_golden(self):
        """Cross-check against an independent numpy implementation."""
        S1 = self._random_cloud(seed=2)
        S2 = self._random_cloud(seed=3)
        got = np.asarray(PR.compute_similarity_transform(jnp.asarray(S1), jnp.asarray(S2)))
        for b in range(S1.shape[0]):
            X1, X2 = S1[b].T, S2[b].T
            mu1, mu2 = X1.mean(1, keepdims=True), X2.mean(1, keepdims=True)
            X1c, X2c = X1 - mu1, X2 - mu2
            var1 = (X1c ** 2).sum()
            K = X1c @ X2c.T
            U, s, Vh = np.linalg.svd(K)
            V = Vh.T
            Z = np.eye(3)
            Z[-1, -1] = np.sign(np.linalg.det(U @ Vh))
            rot = V @ Z @ U.T
            scale = np.trace(rot @ K) / var1
            t = mu2 - scale * rot @ mu1
            exp = (scale * rot @ X1 + t).T
            np.testing.assert_allclose(got[b], exp, atol=1e-4)

    def test_eval_pose_zero_error(self):
        S = jnp.asarray(self._random_cloud())
        mpjpe, re = PR.eval_pose(S, S)
        np.testing.assert_allclose(np.asarray(mpjpe), 0.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(re), 0.0, atol=1e-3)

    def test_pa_invariant_to_similarity(self):
        """PA-MPJPE of (transformed pred, gt) equals PA-MPJPE of (pred, gt)."""
        pred = self._random_cloud(seed=4)
        gt = pred + 0.05 * self._random_cloud(seed=5)
        re0 = np.asarray(PR.reconstruction_error(jnp.asarray(pred), jnp.asarray(gt)))
        rot = np.asarray(R.random_rotations(jax.random.PRNGKey(7), 4))
        pred_t = 1.7 * np.einsum("bij,bnj->bni", rot, pred) + 0.3
        re1 = np.asarray(PR.reconstruction_error(jnp.asarray(pred_t), jnp.asarray(gt)))
        np.testing.assert_allclose(re0, re1, atol=1e-4)

    def test_jit(self):
        S1 = jnp.asarray(self._random_cloud(seed=8))
        S2 = jnp.asarray(self._random_cloud(seed=9))
        f = jax.jit(PR.compute_similarity_transform)
        np.testing.assert_allclose(
            np.asarray(f(S1, S2)),
            np.asarray(PR.compute_similarity_transform(S1, S2)),
            atol=1e-5,
        )
