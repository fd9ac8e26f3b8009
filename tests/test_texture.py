"""Texture/mesh helpers vs a torch replica of ref texture_utils.py."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokenhmr_tpu.utils import texture as TX


def _tetra(batch=2, seed=0):
    rng = np.random.RandomState(seed)
    base = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    v = base[None] + rng.randn(batch, 1, 3).astype(np.float32) * 0.1
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    return v, f


class TestNormals:
    def test_vertex_normals_match_torch_einsum(self):
        torch = pytest.importorskip("torch")
        v, f = _tetra()
        out = np.asarray(TX.vertex_normals(jnp.asarray(v), f))
        # torch replica (ref texture_utils.py:22-33): dense ftov einsum
        tv = torch.from_numpy(v)
        tf = torch.from_numpy(f.astype(np.int64))
        e1 = tv[:, tf[:, 1]] - tv[:, tf[:, 0]]
        e2 = tv[:, tf[:, 2]] - tv[:, tf[:, 0]]
        fn = torch.cross(e1, e2, dim=-1)
        ftov = torch.zeros(4, 4)
        for fi in range(4):
            for c in range(3):
                ftov[f[fi, c], fi] = 1.0
        vn = torch.einsum("ij,bjk->bik", ftov, fn)
        norms = (vn ** 2).sum(-1) ** 0.5
        norms[norms == 0] = 1.0
        ref = (vn / norms[:, :, None]).numpy()
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_unit_length(self):
        v, f = _tetra(3, seed=1)
        vn = np.asarray(TX.vertex_normals(jnp.asarray(v), f))
        np.testing.assert_allclose(
            np.linalg.norm(vn, axis=-1), 1.0, atol=1e-5)


class TestUVSampling:
    def test_uv_to_xyz_barycentric(self):
        v, f = _tetra()
        fmap = np.full((4, 4), -1, np.int64)
        bmap = np.zeros((4, 4, 3), np.float32)
        fmap[0, 0] = 0
        bmap[0, 0] = [1, 0, 0]          # pure corner 0 of face 0
        fmap[1, 2] = 3
        bmap[1, 2] = [1 / 3, 1 / 3, 1 / 3]  # centroid of face 3
        pts, nrm, vn, fids = TX.uv_to_xyz_and_normals(
            jnp.asarray(v), f, fmap, bmap)
        assert pts.shape == (2, 2, 3) and fids.shape == (2,)
        np.testing.assert_allclose(
            np.asarray(pts[:, 0]), v[:, f[0, 0]], atol=1e-6)
        centroid = v[:, f[3]].mean(axis=1)
        np.testing.assert_allclose(np.asarray(pts[:, 1]), centroid, atol=1e-6)
        # normals are barycentric blends of unit vertex normals
        blend = np.asarray(vn)[:, f[3]].mean(axis=1)
        np.testing.assert_allclose(np.asarray(nrm[:, 1]), blend, atol=1e-6)

    def test_jittable(self):
        v, f = _tetra()
        fmap = np.zeros((2, 2), np.int64)
        bmap = np.tile(np.array([0.5, 0.25, 0.25], np.float32), (2, 2, 1))
        fn = jax.jit(lambda vv: TX.uv_to_xyz_and_normals(vv, f, fmap, bmap)[0])
        out = fn(jnp.asarray(v))
        assert np.isfinite(np.asarray(out)).all()


class TestVisibility:
    def test_facing_camera(self):
        # single triangle in the z=0 plane, normal +z (CCW winding)
        v = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        vis_front = TX.face_visibility(jnp.asarray(v), f, cam_pos=[0.3, 0.3, 5.0])
        vis_back = TX.face_visibility(jnp.asarray(v), f, cam_pos=[0.3, 0.3, -5.0])
        assert float(vis_front[0, 0]) == 1.0
        assert float(vis_back[0, 0]) == 0.0


class TestUVSampler:
    def test_matches_torch_reference_math(self):
        rng = np.random.RandomState(2)
        vt = rng.rand(5, 2)
        ft = np.array([[0, 1, 2], [2, 3, 4]])
        T = 3
        out = TX.compute_uvsampler(vt, ft, tex_size=T)
        assert out.shape == (2, T, T, 2)
        # replicate ref obj2nmr_uvmap with itertools.product ordering
        import itertools
        uvv = vt[ft].astype(np.float64).copy()
        uvv[:, :, 1] = 1 - uvv[:, :, 1]
        uvv = 2 * uvv - 1
        alpha = np.arange(T, dtype=float) / (T - 1)
        coords = np.stack([p for p in itertools.product(alpha, alpha)])
        v2 = uvv[:, 2]
        uv_map = np.dstack([uvv[:, 0] - v2, uvv[:, 1] - v2]).dot(coords.T) \
            + v2.reshape(-1, 2, 1)
        ref = np.transpose(uv_map, (0, 2, 1)).reshape(-1, T, T, 2)
        np.testing.assert_allclose(out, ref, atol=1e-12)
        # grid corners hit the (flipped, rescaled) triangle vertices:
        # [i, j] carries barycentric (alpha_i, beta_j, 1-...) over (v0, v1, v2)
        flip = lambda p: (2 * np.array([p[0], 1 - p[1]]) - 1)
        np.testing.assert_allclose(out[0, -1, 0], flip(vt[ft[0, 0]]), atol=1e-12)
        np.testing.assert_allclose(out[0, 0, -1], flip(vt[ft[0, 1]]), atol=1e-12)
        np.testing.assert_allclose(out[0, 0, 0], flip(vt[ft[0, 2]]), atol=1e-12)
