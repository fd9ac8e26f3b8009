"""SMPL layer tests against an independent numpy LBS implementation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokenhmr_tpu.models import smpl as S
from tokenhmr_tpu.ops import rotations as R


def numpy_lbs(model, betas, full_pose):
    """Independent straight-from-the-paper LBS in numpy (reference oracle)."""
    v_template = np.asarray(model.v_template)
    shapedirs = np.asarray(model.shapedirs)
    posedirs = np.asarray(model.posedirs)
    J_reg = np.asarray(model.J_regressor)
    W = np.asarray(model.lbs_weights)
    parents = model.parents
    N = betas.shape[0]
    J = J_reg.shape[0]

    v_shaped = v_template[None] + np.einsum("vdb,nb->nvd", shapedirs, betas)
    joints = np.einsum("jv,nvd->njd", J_reg, v_shaped)
    pose_feat = (full_pose[:, 1:] - np.eye(3)).reshape(N, -1)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(N, -1, 3)

    out_verts = np.zeros_like(v_posed)
    out_joints = np.zeros_like(joints)
    for n in range(N):
        G = np.zeros((J, 4, 4))
        for j in range(J):
            local = np.eye(4)
            local[:3, :3] = full_pose[n, j]
            if j == 0:
                local[:3, 3] = joints[n, j]
                G[j] = local
            else:
                local[:3, 3] = joints[n, j] - joints[n, parents[j]]
                G[j] = G[parents[j]] @ local
        out_joints[n] = G[:, :3, 3]
        A = G.copy()
        for j in range(J):
            A[j, :3, 3] -= A[j, :3, :3] @ joints[n, j]
        T = np.einsum("vj,jab->vab", W, A)
        out_verts[n] = np.einsum("vab,vb->va", T[:, :3, :3], v_posed[n]) + T[:, :3, 3]
    return out_verts, out_joints


@pytest.fixture(scope="module")
def model():
    return S.synthetic_smpl_model(num_vertices=300, num_joints=24)


@pytest.fixture(scope="module")
def smplh_model():
    return S.synthetic_smpl_model(num_vertices=300, num_joints=52, seed=3)


def _rand_pose(n, j, seed=0, scale=0.4):
    rng = np.random.RandomState(seed)
    aa = rng.randn(n, j, 3).astype(np.float32) * scale
    return np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa)))


class TestLBS:
    def test_rest_pose_is_template(self, model):
        betas = jnp.zeros((2, 10))
        pose = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        verts, joints = S.lbs(model, betas, pose)
        np.testing.assert_allclose(
            np.asarray(verts), np.broadcast_to(np.asarray(model.v_template), (2, 300, 3)), atol=1e-5
        )

    def test_matches_numpy_oracle(self, model):
        rng = np.random.RandomState(1)
        betas = rng.randn(3, 10).astype(np.float32)
        pose = _rand_pose(3, 24, seed=2)
        verts, joints = S.lbs(model, jnp.asarray(betas), jnp.asarray(pose))
        v_ref, j_ref = numpy_lbs(model, betas, pose)
        np.testing.assert_allclose(np.asarray(verts), v_ref, atol=2e-5)
        np.testing.assert_allclose(np.asarray(joints), j_ref, atol=2e-5)

    def test_smplh_52_joints(self, smplh_model):
        betas = jnp.zeros((2, 10))
        pose = jnp.asarray(_rand_pose(2, 52, seed=4))
        verts, joints = S.lbs(smplh_model, betas, pose)
        assert joints.shape == (2, 52, 3)
        v_ref, j_ref = numpy_lbs(smplh_model, np.zeros((2, 10), np.float32), np.asarray(pose))
        np.testing.assert_allclose(np.asarray(verts), v_ref, atol=2e-5)

    def test_global_rotation_equivariance(self, model):
        """Rotating the root rotates all outputs rigidly."""
        betas = jnp.zeros((1, 10))
        pose = jnp.asarray(_rand_pose(1, 24, seed=5))
        verts0, joints0 = S.lbs(model, betas, pose)
        rot = np.asarray(R.axis_angle_to_matrix(jnp.asarray([[0.3, -0.2, 0.5]])))[0]
        pose_rot = np.asarray(pose).copy()
        pose_rot[:, 0] = rot @ pose_rot[:, 0]
        verts1, joints1 = S.lbs(model, betas, jnp.asarray(pose_rot))
        # root joint location is preserved; everything rotates about it
        root = np.asarray(joints0)[:, :1]
        exp = np.einsum("ab,nvb->nva", rot, np.asarray(verts0) - root) + root
        np.testing.assert_allclose(np.asarray(verts1), exp, atol=1e-4)

    def test_jit_and_grad(self, model):
        betas = jnp.zeros((2, 10))
        pose = jnp.asarray(_rand_pose(2, 24, seed=6))

        @jax.jit
        def f(b, p):
            v, j = S.lbs(model, b, p)
            return jnp.sum(v ** 2)

        g = jax.grad(f)(betas, pose)
        assert np.all(np.isfinite(np.asarray(g)))


class TestWrappers:
    def test_smpl_forward_joint_count(self, model):
        betas = jnp.zeros((2, 10))
        go = jnp.broadcast_to(jnp.eye(3), (2, 1, 3, 3))
        bp = jnp.asarray(_rand_pose(2, 23, seed=7))
        out = S.smpl_forward(model, betas, go, bp)
        assert out["joints"].shape == (2, 24 + 21, 3)
        assert out["vertices"].shape == (2, 300, 3)

    def test_openpose_wrapper_44_joints(self, model):
        betas = jnp.zeros((2, 10))
        go = jnp.broadcast_to(jnp.eye(3), (2, 1, 3, 3))
        bp = jnp.asarray(_rand_pose(2, 23, seed=8))
        out = S.smpl_openpose_forward(model, betas, go, bp)
        assert out["joints"].shape == (2, 25 + 19, 3)
        # openpose remap picks from the 45-joint set
        base = S.smpl_forward(model, betas, go, bp)["joints"]
        np.testing.assert_allclose(
            np.asarray(out["joints"][:, :25]),
            np.asarray(base[:, S.SMPL_TO_OPENPOSE]),
            atol=1e-6,
        )

    def test_smplh_body_forward(self, smplh_model):
        bp = jnp.asarray(_rand_pose(2, 21, seed=9))
        out = S.smplh_body_forward(smplh_model, bp)
        assert out["vertices"].shape == (2, 300, 3)
        assert out["joints"].shape == (2, 52 + 21, 3)
        # flat hands: changing body pose changes output, identity matches rest
        out_rest = S.smplh_body_forward(
            smplh_model, jnp.broadcast_to(jnp.eye(3), (2, 21, 3, 3))
        )
        assert not np.allclose(np.asarray(out["vertices"]), np.asarray(out_rest["vertices"]))


class TestLoader:
    def test_npz_roundtrip(self, tmp_path):
        """Save a synthetic model in artifact layout, reload, compare forward."""
        m = S.synthetic_smpl_model(num_vertices=120, num_joints=24, seed=11)
        V, J = 120, 24
        rng = np.random.RandomState(0)
        kintree = np.stack([m.parents.astype(np.int64), np.arange(J)], axis=0)
        kintree[0, 0] = 2 ** 32 - 1  # artifact convention for root
        path = str(tmp_path / "model.npz")
        np.savez(
            path,
            v_template=np.asarray(m.v_template),
            shapedirs=np.asarray(m.shapedirs),
            posedirs=np.asarray(m.posedirs).T.reshape(V, 3, -1),
            J_regressor=np.asarray(m.J_regressor),
            weights=np.asarray(m.lbs_weights),
            kintree_table=kintree,
            f=m.faces,
        )
        loaded = S.load_smpl_model(path)
        betas = jnp.asarray(rng.randn(2, 10).astype(np.float32))
        pose = jnp.asarray(_rand_pose(2, 24, seed=12))
        v0, _ = S.lbs(m, betas, pose)
        v1, _ = S.lbs(loaded, betas, pose)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)

    def test_pkl_with_chumpy_shim(self, tmp_path):
        """Emulate a legacy chumpy-bearing pkl via the shim contract."""
        import pickle

        class FakeCh:
            pass

        m = S.synthetic_smpl_model(num_vertices=80, num_joints=24, seed=13)
        data = {
            "v_template": np.asarray(m.v_template),
            "shapedirs": np.asarray(m.shapedirs),
            "posedirs": np.asarray(m.posedirs).T.reshape(80, 3, -1),
            "J_regressor": np.asarray(m.J_regressor),
            "weights": np.asarray(m.lbs_weights),
            "kintree_table": np.stack([m.parents, np.arange(24)]),
            "f": m.faces,
        }
        path = str(tmp_path / "model.pkl")
        with open(path, "wb") as f:
            pickle.dump(data, f)
        loaded = S.load_smpl_model(path)
        assert loaded.num_joints == 24
