"""Device warp vs cv2 parity + visualization grid smoke tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from tokenhmr_tpu.ops import warp as W
from tokenhmr_tpu.ops.crop import gen_crop_affine


class TestDeviceWarp:
    def test_matches_cv2(self):
        rng = np.random.RandomState(0)
        img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
        transs = np.stack([
            gen_crop_affine(160, 120, 180, 240, 64, 64, 1.0, 15.0),
            gen_crop_affine(100, 100, 120, 160, 64, 64, 1.2, -20.0),
        ]).astype(np.float32)
        mean = np.zeros(3, np.float32)
        std = np.ones(3, np.float32)
        out = np.asarray(W.warp_crops_device(
            jnp.asarray(img), jnp.asarray(transs), (64, 64), mean, std))
        for i in range(2):
            ref = cv2.warpAffine(img, transs[i], (64, 64),
                                 flags=cv2.INTER_LINEAR).astype(np.float32)
            assert np.abs(out[i] - ref).mean() < 0.5

    def test_normalization_applied(self):
        img = jnp.full((32, 32, 3), 128, jnp.uint8)
        trans = jnp.asarray(gen_crop_affine(16, 16, 32, 32, 16, 16)[None],
                            jnp.float32)
        out = np.asarray(W.warp_crops_device(img, trans, (16, 16)))
        exp = (128 - W.IMAGENET_MEAN) / W.IMAGENET_STD
        np.testing.assert_allclose(out[0, 8, 8], exp, atol=1e-4)

    def test_jit_and_out_of_bounds(self):
        img = jnp.zeros((32, 32, 3), jnp.uint8)
        trans = jnp.asarray(gen_crop_affine(-100, -100, 10, 10, 16, 16)[None],
                            jnp.float32)
        f = jax.jit(lambda i, t: W.warp_crops_device(i, t, (16, 16),
                                                     np.zeros(3, np.float32),
                                                     np.ones(3, np.float32)))
        out = np.asarray(f(img, trans))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_multi_frame_matches_single(self):
        rng = np.random.RandomState(3)
        frames = (rng.rand(2, 120, 160, 3) * 255).astype(np.uint8)
        transs = np.stack([
            gen_crop_affine(80, 60, 90, 120, 32, 32, 1.0, 10.0),
            gen_crop_affine(50, 50, 60, 80, 32, 32, 1.1, -5.0),
            gen_crop_affine(100, 70, 80, 100, 32, 32, 0.9, 0.0),
        ]).astype(np.float32)
        fidx = np.array([0, 1, 1], np.int32)
        mean = np.zeros(3, np.float32)
        std = np.ones(3, np.float32)
        multi = np.asarray(W.warp_crops_device_multi(
            jnp.asarray(frames), jnp.asarray(transs), jnp.asarray(fidx),
            (32, 32), mean, std))
        for i, fi in enumerate(fidx):
            single = np.asarray(W.warp_crops_device(
                jnp.asarray(frames[fi]), jnp.asarray(transs[i:i + 1]),
                (32, 32), mean, std))
            # 0-255-scale pixels; fp associativity differs across the
            # fused gather orders -> tolerance well above that noise
            np.testing.assert_allclose(multi[i], single[0], atol=0.01)

    def test_affines_for_boxes(self):
        aff = W.crop_affines_for_boxes(
            np.array([[50.0, 60.0]]), np.array([100.0]), out_size=64)
        assert aff.shape == (1, 2, 3)


class TestVizGrid:
    def test_batch_grid(self):
        from tokenhmr_tpu.models import smpl as S
        from tokenhmr_tpu.utils.viz_grid import visualize_batch_grid

        model = S.synthetic_smpl_model(num_vertices=150, num_joints=24)
        rng = np.random.RandomState(0)
        B, H, Wd = 2, 64, 48
        batch = {
            "img": rng.randn(B, H, Wd, 3).astype(np.float32) * 0.5,
            "keypoints_2d": rng.rand(B, 44, 3).astype(np.float32) - 0.5,
        }
        output = {
            "pred_vertices": rng.randn(B, 150, 3).astype(np.float32) * 0.2,
            "pred_cam_t": np.tile([[0, 0, 20]], (B, 1)).astype(np.float32),
            "pred_keypoints_2d": rng.rand(B, 44, 2).astype(np.float32) - 0.5,
            "focal_length": np.full((B, 2), 5000.0, np.float32),
        }
        grid = visualize_batch_grid(batch, output, model.faces, num_images=2)
        assert grid.shape == (2 * H, 5 * Wd, 3)
        assert grid.dtype == np.uint8

    def test_pose_grid(self):
        from tokenhmr_tpu.models import smpl as S
        from tokenhmr_tpu.utils.viz_grid import visualize_pose_grid

        model = S.synthetic_smpl_model(num_vertices=100, num_joints=24)
        rng = np.random.RandomState(1)
        gt = rng.randn(2, 100, 3).astype(np.float32) * 0.3
        pred = gt + 0.01
        grid = visualize_pose_grid(gt, pred, model.faces, image_size=64)
        assert grid.shape == (128, 192, 3)


class TestRegistry:
    def test_factory(self):
        from tokenhmr_tpu.data.registry import create_dataset, _REGISTRY

        assert "ImageDataset" in _REGISTRY
        with pytest.raises(KeyError, match="unknown dataset type"):
            create_dataset("Nope")


class TestFullFramePipeline:
    def test_serve_pipeline(self):
        import __graft_entry__ as G
        from tokenhmr_tpu.serve import FullFramePipeline

        cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=1, tiny=True)
        pipe = FullFramePipeline(params, frozen, cfg, smpl_model, buckets=(2, 4))
        rng = np.random.RandomState(0)
        frame = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
        boxes = np.array([[20, 20, 120, 180], [150, 30, 260, 190],
                          [40, 10, 90, 120]], np.float32)
        out = pipe(frame, boxes)
        assert out["pred_vertices"].shape[0] == 3       # sliced to true N
        assert out["pred_cam_t_full"].shape == (3, 3)
        assert np.isfinite(out["pred_vertices"]).all()
        # empty boxes
        assert pipe(frame, np.zeros((0, 4), np.float32)) == {}

    def test_run_frames_matches_per_frame(self):
        """Cross-frame dynamic batching must agree with the per-frame
        path (same crops, same model) and slice results back per frame."""
        import __graft_entry__ as G
        from tokenhmr_tpu.serve import FullFramePipeline

        cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=1,
                                                         tiny=True)
        pipe = FullFramePipeline(params, frozen, cfg, smpl_model,
                                 buckets=(2, 4))
        rng = np.random.RandomState(1)
        frames = [(rng.rand(180, 240, 3) * 255).astype(np.uint8),
                  (rng.rand(200, 300, 3) * 255).astype(np.uint8),
                  (rng.rand(160, 200, 3) * 255).astype(np.uint8)]
        boxes = [np.array([[10, 10, 100, 170], [120, 20, 230, 175]],
                          np.float32),
                 np.zeros((0, 4), np.float32),
                 np.array([[30, 20, 150, 150]], np.float32)]
        outs = pipe.run_frames(frames, boxes)
        assert len(outs) == 3
        assert outs[1] == {}
        assert outs[0]["pred_vertices"].shape[0] == 2
        assert outs[2]["pred_vertices"].shape[0] == 1
        for i in (0, 2):
            ref = pipe(frames[i], boxes[i])
            np.testing.assert_allclose(
                outs[i]["pred_vertices"], ref["pred_vertices"],
                atol=2e-3)
            np.testing.assert_allclose(
                outs[i]["pred_cam_t_full"], ref["pred_cam_t_full"],
                atol=2e-2)
