"""Tar streaming pipeline + filters tests on generated shards."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tokenhmr_tpu.data import filters as F
from tokenhmr_tpu.data.tar_dataset import (
    MixedTarDataset, TarDatasetConfig, TarPoseDataset, batched, expand_urls,
    iter_tar_samples, write_tar_shard,
)


def _person(rng, has_pose=1.0, has_betas=1.0, nkp=44):
    return {
        "keypoints_2d": np.concatenate(
            [rng.rand(nkp, 2) * 100, np.ones((nkp, 1))], 1
        ).astype(np.float32),
        "keypoints_3d": rng.rand(nkp, 4).astype(np.float32),
        "center": np.array([60.0, 80.0], np.float32),
        "scale": np.array([0.4, 0.6], np.float32),
        "body_pose": (rng.randn(72) * 0.2).astype(np.float32),
        "betas": (rng.randn(10) * 0.5).astype(np.float32),
        "has_body_pose": np.array(has_pose, np.float32),
        "has_betas": np.array(has_betas, np.float32),
        "extra_info": {},
    }


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    root = tmp_path_factory.mktemp("tars")
    rng = np.random.RandomState(0)
    for si in range(2):
        samples = []
        for i in range(5):
            img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
            n_person = 1 + (i % 2)
            data = [_person(rng) for _ in range(n_person)]
            samples.append({"key": f"s{si}_{i:04d}", "jpg": img, "data": data})
        write_tar_shard(str(root / f"shard-{si:06d}.tar"), samples)
    return str(root)


class TestTarReading:
    def test_expand_urls(self):
        out = expand_urls("data-{000000..000003}.tar")
        assert out == [f"data-{i:06d}.tar" for i in range(4)]
        assert expand_urls("plain.tar") == ["plain.tar"]

    def test_iter_samples(self, shards):
        samples = list(iter_tar_samples(os.path.join(shards, "shard-000000.tar")))
        assert len(samples) == 5
        s = samples[0]
        assert s["jpg"].shape == (120, 160, 3)
        assert isinstance(s["data.pyd"], list)

    def test_stream_produces_training_items(self, shards):
        cfg = TarDatasetConfig(
            urls=os.path.join(shards, "shard-{000000..000001}.tar"),
            dataset_name="TEST", img_size=64, shuffle_buffer=4,
        )
        ds = TarPoseDataset(cfg)
        it = iter(ds)
        items = [next(it) for _ in range(10)]
        for item in items:
            assert item["img"].shape == (64, 64, 3)
            assert item["mask"].shape == (64, 64)
            assert item["keypoints_2d"].shape == (44, 3)
            assert item["smpl_params"]["body_pose"].shape == (69,)
            assert np.isfinite(item["img"]).all()

    def test_mixing_and_batching(self, shards):
        cfgs = [
            TarDatasetConfig(
                urls=os.path.join(shards, f"shard-{i:06d}.tar"),
                dataset_name=f"DS{i}", img_size=64, shuffle_buffer=1,
            )
            for i in range(2)
        ]
        mixed = MixedTarDataset(
            [TarPoseDataset(c) for c in cfgs], weights=[0.7, 0.3]
        )
        batches = batched(iter(mixed), batch_size=4)
        b = next(batches)
        assert b["img"].shape == (4, 64, 64, 3)
        assert len(b["dataset"]) == 4

    def test_host_shard_split(self, shards):
        cfg = TarDatasetConfig(urls=os.path.join(shards, "shard-{000000..000001}.tar"))
        d0 = TarPoseDataset(cfg, process_index=0, process_count=2)
        d1 = TarPoseDataset(cfg, process_index=1, process_count=2)
        assert set(d0.urls).isdisjoint(d1.urls)
        assert len(d0.urls) + len(d1.urls) == 2


class TestFilters:
    def test_suppress_bad_kps(self):
        rng = np.random.RandomState(1)
        d = _person(rng)
        d["keypoints_2d"][:, 2] = 0.2
        out = F.suppress_bad_kps(d, thresh=0.3)
        assert (out["keypoints_2d"][:, 2] == 0).all()

    def test_suppress_bad_betas(self):
        rng = np.random.RandomState(2)
        d = _person(rng)
        d["betas"][0] = 10.0
        out = F.suppress_bad_betas(d, thresh=3.0)
        assert float(out["has_betas"]) == 0.0

    def test_poses_betas_simultaneous(self):
        rng = np.random.RandomState(3)
        d = _person(rng, has_pose=1.0, has_betas=0.0)
        out = F.poses_betas_simultaneous(d)
        assert float(out["has_body_pose"]) == 0.0

    def test_betas_reg(self):
        rng = np.random.RandomState(4)
        d = _person(rng, has_betas=0.0)
        out = F.set_betas_for_reg(d)
        assert float(out["has_betas"]) == 1.0
        assert (out["betas"] == 0).all()

    def test_filter_numkp(self):
        rng = np.random.RandomState(5)
        d = _person(rng)
        d["keypoints_2d"][:, 2] = 0
        d["keypoints_2d"][:3, 2] = 1
        assert not F.filter_numkp(d, numkp=4)
        d["keypoints_2d"][:6, 2] = 1
        assert F.filter_numkp(d, numkp=4)

    def test_normalize_axis_angle(self):
        aa = np.array([[0, 0, 3 * np.pi]], np.float32)  # angle 3pi == pi about -z... wraps
        out = F.normalize_axis_angle(aa)
        angle = np.linalg.norm(out)
        assert angle <= np.pi + 1e-5

    def test_amass_prob_filter(self):
        # synthetic histogram concentrated at the origin bin region
        hist = np.zeros((21, 10, 10, 10), np.float32)
        hist[:, 4, 4, 4] = 1.0  # angle 0 falls in bin floor((0.5)*(nbins-eps))=4
        hist = hist / hist.sum() / (2 * np.pi / 10) ** 3
        near_zero = np.zeros(69, np.float32)
        assert F.poses_check_probable(near_zero, hist)
        # (3,3,3) would wrap back to a moderate angle; use 2.5 rad about x
        # which stays in-range but lands far from the populated bin
        extreme = np.tile(np.array([2.5, 0, 0], np.float32), 23)
        assert not F.poses_check_probable(extreme, hist)


class TestBedlam:
    def test_bedlam_variant_derives_keypoints(self, tmp_path):
        from tokenhmr_tpu.data.tar_dataset import BedlamTarDataset, write_tar_shard
        from tokenhmr_tpu.models import smpl as S

        rng = np.random.RandomState(0)
        smpl_model = S.synthetic_smpl_model(num_vertices=200, num_joints=24)
        samples = []
        for i in range(3):
            img = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
            data = [{
                "pose_cam": (rng.randn(72) * 0.2).astype(np.float32),
                "shape": (rng.randn(11) * 0.3).astype(np.float32),
                "trans_cam": np.array([0, 0, 5], np.float32),
                "cam_int": np.array([[500, 0, 60], [0, 500, 50], [0, 0, 1]], np.float32),
                "center": np.array([60.0, 50.0], np.float32),
                "scale": np.float32(0.4),
                "extra_info": {},
            }]
            samples.append({"key": f"seq_{i:04d}", "jpg": img, "data": data})
        path = str(tmp_path / "bedlam-000000.tar")
        write_tar_shard(path, samples)

        from tokenhmr_tpu.data.tar_dataset import TarDatasetConfig

        cfg = TarDatasetConfig(urls=path, dataset_name="BEDLAM", img_size=64,
                               shuffle_buffer=1, filter_numkp=0)
        ds = BedlamTarDataset(cfg, smpl_model)
        it = iter(ds)
        item = next(it)
        assert item["img"].shape == (64, 64, 3)
        assert item["keypoints_3d"].shape[1] == 4
        assert item["has_smpl_params"]["body_pose"] == 1.0
        assert np.isfinite(item["keypoints_2d"]).all()

    def test_bedlam_joint_order_is_openpose44(self, tmp_path):
        """kp3d must be [25 OpenPose + 19 extra-regressor], not raw smplx
        order — the flip tables/TALS thresholds/PELVIS_ID index OpenPose-44."""
        from tokenhmr_tpu.data.tar_dataset import (
            BedlamTarDataset, TarDatasetConfig, write_tar_shard)
        from tokenhmr_tpu.models import smpl as S
        from tokenhmr_tpu.models.smpl import smpl_openpose_forward_numpy

        rng = np.random.RandomState(1)
        smpl_model = S.synthetic_smpl_model(num_vertices=200, num_joints=24)
        pose = (rng.randn(72) * 0.2).astype(np.float32)
        betas = (rng.randn(11) * 0.3).astype(np.float32)
        data = [{
            "pose_cam": pose, "shape": betas,
            "trans_cam": np.array([0, 0, 5], np.float32),
            "cam_int": np.array([[500, 0, 60], [0, 500, 50], [0, 0, 1]], np.float32),
            "center": np.array([60.0, 50.0], np.float32),
            "scale": np.float32(0.4), "extra_info": {},
        }]
        img = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
        path = str(tmp_path / "b.tar")
        write_tar_shard(path, [{"key": "seq_0", "jpg": img, "data": data}])
        cfg = TarDatasetConfig(urls=path, dataset_name="BEDLAM", img_size=64,
                               shuffle_buffer=1, filter_numkp=0, train=False)
        item = next(iter(BedlamTarDataset(cfg, smpl_model)))
        expected = smpl_openpose_forward_numpy(
            smpl_model, betas[None, :10], pose[None])["joints"][0]
        np.testing.assert_allclose(item["keypoints_3d"][:, :3], expected,
                                   atol=1e-4)
        assert item["keypoints_3d"].shape == (44, 4)

    def test_bedlam_closeup_mask_rotated(self, tmp_path):
        from tokenhmr_tpu.data.tar_dataset import (
            BedlamTarDataset, TarDatasetConfig, write_tar_shard)
        from tokenhmr_tpu.models import smpl as S

        rng = np.random.RandomState(2)
        smpl_model = S.synthetic_smpl_model(num_vertices=150, num_joints=24)
        H, W = 80, 120
        data = [{
            "pose_cam": (rng.randn(72) * 0.1).astype(np.float32),
            "shape": np.zeros(11, np.float32),
            "trans_cam": np.array([0, 0, 5], np.float32),
            "cam_int": np.array([[400, 0, 40], [0, 400, 60], [0, 0, 1]], np.float32),
            "center": np.array([40.0, 60.0], np.float32),
            "scale": np.float32(0.3), "extra_info": {"detection_npz_idx": 0},
        }]
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        masks = np.ones((1, H, W), bool)
        path = str(tmp_path / "c.tar")
        write_tar_shard(path, [{"key": "closeup_seq_0", "jpg": img,
                                "data": data, "masks": masks}])
        cfg = TarDatasetConfig(urls=path, dataset_name="BEDLAM", img_size=64,
                               shuffle_buffer=1, filter_numkp=0, train=False)
        # would raise a concat shape error before the mask-rotation fix
        item = next(iter(BedlamTarDataset(cfg, smpl_model)))
        assert item["img"].shape == (64, 64, 3)
