"""End-to-end eval pipeline test: synthetic npz dataset + images ->
cli.eval main() -> metrics CSV.  Also validates the Evaluator protocols."""
import csv
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokenhmr_tpu.utils.evaluator import Evaluator


def _make_synthetic_dataset(root, n=6, img_hw=(120, 100)):
    """Write images + a 3DPW-style annotation npz."""
    cv2 = pytest.importorskip("cv2")
    img_dir = os.path.join(root, "3DPW")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        img = (rng.rand(*img_hw, 3) * 255).astype(np.uint8)
        name = f"img_{i:03d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), img)
        names.append(name)
    H, W = img_hw
    np.savez(
        os.path.join(root, "3dpw_test.npz"),
        imgname=np.array(names),
        center=np.tile([[W / 2, H / 2]], (n, 1)).astype(np.float32),
        scale=(np.ones((n, 2)) * 0.5).astype(np.float32),
        body_pose=rng.randn(n, 72).astype(np.float32) * 0.2,
        has_body_pose=np.ones(n, np.float32),
        betas=rng.randn(n, 10).astype(np.float32) * 0.3,
        has_betas=np.ones(n, np.float32),
        body_keypoints_2d=rng.rand(n, 25, 3).astype(np.float32),
        extra_keypoints_2d=np.zeros((n, 19, 3), np.float32),
        body_keypoints_3d=rng.rand(n, 25, 4).astype(np.float32),
        extra_keypoints_3d=rng.rand(n, 19, 4).astype(np.float32),
        gender=np.array(["m", "f"] * (n // 2)),
    )


def _make_synthetic_emdb_dataset(root, n=6, img_hw=(120, 100)):
    """Write images + an EMDB-layout annotation npz (ref
    emdb_dataset.py:51-104): concatenated 44-joint keypoints_2d, scalar
    (n,1) scale exercising the tile path, mixed genders."""
    cv2 = pytest.importorskip("cv2")
    img_dir = os.path.join(root, "EMDB")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    names = []
    for i in range(n):
        img = (rng.rand(*img_hw, 3) * 255).astype(np.uint8)
        name = f"img_{i:03d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), img)
        names.append(name)
    H, W = img_hw
    np.savez(
        os.path.join(img_dir, "emdb_for_hmr2.npz"),
        imgname=np.array(names),
        center=np.tile([[W / 2, H / 2]], (n, 1)).astype(np.float32),
        scale=(np.ones((n, 1)) * 0.5).astype(np.float32),
        body_pose=rng.randn(n, 72).astype(np.float32) * 0.2,
        has_body_pose=np.ones(n, np.float32),
        betas=rng.randn(n, 10).astype(np.float32) * 0.3,
        has_betas=np.ones(n, np.float32),
        keypoints_2d=rng.rand(n, 44, 3).astype(np.float32),
        body_keypoints_3d=rng.rand(n, 25, 4).astype(np.float32),
        extra_keypoints_3d=rng.rand(n, 19, 4).astype(np.float32),
        gender=np.array(["m", "f"] * (n // 2)),
    )


class TestEvaluatorUnits:
    def test_pelvis_protocol_zero_for_identical(self):
        ev = Evaluator(10, keypoint_list=[25, 26, 27], pelvis_ind=39)
        kp = np.random.RandomState(0).randn(4, 44, 3).astype(np.float32)
        verts = np.random.RandomState(1).randn(4, 50, 3).astype(np.float32)
        out = {"pred_keypoints_3d": jnp.asarray(kp), "pred_vertices": jnp.asarray(verts)}
        batch = {"keypoints_3d": jnp.asarray(np.concatenate([kp, np.ones((4, 44, 1), np.float32)], -1)),
                 "vertices": jnp.asarray(verts)}
        ev(out, batch)
        m = ev.get_metrics_dict()
        assert m["mode_mpjpe"] < 1e-3 and m["mode_pve"] < 1e-3

    def test_emdb_protocol_midhip(self):
        rng = np.random.RandomState(2)
        J24 = rng.rand(24, 50).astype(np.float32)
        J24 /= J24.sum(1, keepdims=True)
        ev = Evaluator(10, keypoint_list=list(range(24)),
                       J_regressor_24=J24, dataset="EMDB")
        verts = rng.randn(4, 50, 3).astype(np.float32)
        # prediction differs from gt by a pure translation -> all metrics ~0
        out = {"pred_vertices": jnp.asarray(verts + 5.0)}
        batch = {"vertices": jnp.asarray(verts)}
        ev(out, batch)
        m = ev.get_metrics_dict()
        assert m["mode_mpjpe"] < 1e-2 and m["mode_pve"] < 1e-2

    def test_translation_invariance_vs_rotation_sensitivity(self):
        rng = np.random.RandomState(3)
        J24 = rng.rand(24, 50).astype(np.float32)
        J24 /= J24.sum(1, keepdims=True)
        verts = rng.randn(2, 50, 3).astype(np.float32)
        # rotated prediction: MPJPE > 0 but PA-MPJPE ~ 0
        from tokenhmr_tpu.ops.rotations import axis_angle_to_matrix
        R = np.asarray(axis_angle_to_matrix(jnp.asarray([[0.0, 0.6, 0.0]])))[0]
        ev = Evaluator(10, keypoint_list=list(range(24)),
                       J_regressor_24=J24, dataset="EMDB")
        out = {"pred_vertices": jnp.asarray(verts @ R.T)}
        ev(out, {"vertices": jnp.asarray(verts)})
        m = ev.get_metrics_dict()
        assert m["mode_mpjpe"] > 10.0     # mm
        assert m["mode_re"] < 1e-2


class TestEvalCli:
    def test_tiny_end_to_end(self, tmp_path):
        _make_synthetic_dataset(str(tmp_path))
        from cli.eval import main

        results = str(tmp_path / "results.csv")
        main([
            "--dataset", "3DPW-TEST",
            "--dataset-dir", str(tmp_path),
            "--results-file", results,
            "--batch-size", "3",
            "--tiny",
            "--num-workers", "2",
        ])
        assert os.path.exists(results)
        with open(results) as f:
            rows = list(csv.DictReader(f))
        names = {r["metric_name"] for r in rows}
        assert names == {"mode_mpjpe", "mode_re", "mode_pve"}
        for r in rows:
            assert np.isfinite(float(r["metric_value"]))

    def test_tiny_end_to_end_emdb(self, tmp_path):
        """EMDB-layout npz through the production eval path: concatenated
        keypoint loading, gendered GT vertices, mid-hip/J24 protocol
        (VERDICT r3 #5)."""
        _make_synthetic_emdb_dataset(str(tmp_path))
        from cli.eval import main

        results = str(tmp_path / "results.csv")
        main([
            "--dataset", "EMDB",
            "--dataset-dir", str(tmp_path),
            "--results-file", results,
            "--batch-size", "3",
            "--tiny",
            "--num-workers", "2",
        ])
        with open(results) as f:
            rows = list(csv.DictReader(f))
        assert {r["dataset"] for r in rows} == {"EMDB"}
        names = {r["metric_name"] for r in rows}
        assert names == {"mode_mpjpe", "mode_re", "mode_pve"}
        for r in rows:
            assert np.isfinite(float(r["metric_value"]))

    def test_tiny_end_to_end_with_merge(self, tmp_path):
        """--merge exercises the ToMe inference path through the eval CLI."""
        _make_synthetic_dataset(str(tmp_path))
        from cli.eval import main

        results = str(tmp_path / "results_merge.csv")
        main([
            "--dataset", "3DPW-TEST",
            "--dataset-dir", str(tmp_path),
            "--results-file", results,
            "--batch-size", "3",
            "--tiny",
            "--merge", "1:2",
            "--num-workers", "2",
        ])
        with open(results) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 3
        for r in rows:
            assert np.isfinite(float(r["metric_value"]))

    def test_tiny_end_to_end_multidevice(self, tmp_path):
        """--n-devices 8 shards the eval batch over the CPU mesh (conftest
        forces xla_force_host_platform_device_count=8); the single ragged
        batch (6 samples, batch 8) exercises the pad-and-slice path."""
        _make_synthetic_dataset(str(tmp_path))
        from cli.eval import main

        results = str(tmp_path / "results_dp.csv")
        main([
            "--dataset", "3DPW-TEST",
            "--dataset-dir", str(tmp_path),
            "--results-file", results,
            "--batch-size", "8",
            "--tiny",
            "--n-devices", "8",
            "--num-workers", "2",
        ])
        with open(results) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 3
        for r in rows:
            assert np.isfinite(float(r["metric_value"]))

    def test_tiny_quant_int8_calibrated(self, tmp_path):
        """--quant int8 calibrates on the first batch and completes."""
        _make_synthetic_dataset(str(tmp_path))
        from cli.eval import main

        results = str(tmp_path / "results_q8.csv")
        main([
            "--dataset", "3DPW-TEST",
            "--dataset-dir", str(tmp_path),
            "--results-file", results,
            "--batch-size", "3",
            "--tiny",
            "--quant", "int8",
            "--num-workers", "2",
        ])
        with open(results) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 3
        for r in rows:
            assert np.isfinite(float(r["metric_value"]))
