"""Native warp kernel vs cv2 golden parity + fused-normalize correctness."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tokenhmr_tpu import native
from tokenhmr_tpu.ops.crop import gen_crop_affine


@pytest.fixture(scope="module")
def lib():
    try:
        return native.get_lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(0)
    return (rng.rand(240, 320, 3) * 255).astype(np.uint8)


class TestWarpParity:
    @pytest.mark.parametrize("rot,scale", [(0.0, 1.0), (15.0, 1.2), (-40.0, 0.8)])
    def test_matches_cv2(self, lib, img, rot, scale):
        trans = gen_crop_affine(160, 120, 180, 240, 192, 256, scale, rot)
        ours = native.warp_affine_u8(img, trans, (192, 256))
        ref = cv2.warpAffine(img, trans, (192, 256), flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_CONSTANT)
        # cv2 uses 5-bit fixed-point interpolation; allow +-2 levels
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert np.mean(diff) < 0.6
        assert np.percentile(diff, 99.9) <= 2

    def test_out_of_bounds_crop_is_zero_bordered(self, lib, img):
        trans = gen_crop_affine(-200, -200, 100, 100, 64, 64, 1.0, 0.0)
        ours = native.warp_affine_u8(img, trans, (64, 64))
        assert ours.sum() == 0

    def test_grayscale(self, lib, img):
        gray = img[:, :, 0]
        trans = gen_crop_affine(100, 100, 150, 150, 64, 64, 1.0, 10.0)
        ours = native.warp_affine_u8(gray, trans, (64, 64))
        ref = cv2.warpAffine(gray, trans, (64, 64), flags=cv2.INTER_LINEAR)
        assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 0.6


class TestFusedNormalize:
    def test_matches_separate_ops(self, lib, img):
        trans = gen_crop_affine(160, 120, 200, 260, 192, 256, 1.0, 5.0)
        mean = 255.0 * np.array([0.485, 0.456, 0.406], np.float32)
        std = 255.0 * np.array([0.229, 0.224, 0.225], np.float32)
        cs = np.array([1.1, 0.95, 1.0], np.float32)
        fused = native.warp_normalize(img, trans, (256, 192), cs, mean, std)
        ref_patch = cv2.warpAffine(img, trans, (192, 256), flags=cv2.INTER_LINEAR)
        ref = (np.clip(ref_patch.astype(np.float32) * cs, 0, 255) - mean) / std
        assert np.abs(fused - ref).mean() < 0.02

    def test_batched_multicrop(self, lib, img):
        mean = np.zeros(3, np.float32)
        std = np.ones(3, np.float32)
        cs = np.ones(3, np.float32)
        transs = np.stack([
            gen_crop_affine(100 + 30 * i, 100, 150, 200, 96, 128, 1.0, 0.0)
            for i in range(4)
        ])
        out = native.warp_normalize(img, transs, (128, 96), cs, mean, std,
                                    num_threads=2)
        assert out.shape == (4, 128, 96, 3)
        for i in range(4):
            single = native.warp_normalize(img, transs[i], (128, 96), cs, mean, std)
            np.testing.assert_array_equal(out[i], single)

    def test_augment_backend_swap(self, lib, img):
        from tokenhmr_tpu.data import augment as A

        native.use_as_augment_backend()
        try:
            patch, trans = A.generate_image_patch(
                img, 160, 120, 180, 240, 96, 128, do_flip=False, scale=1.0, rot=20.0
            )
            ref = cv2.warpAffine(img, trans, (96, 128), flags=cv2.INTER_LINEAR)
            assert np.mean(np.abs(patch.astype(int) - ref.astype(int))) < 0.6
        finally:
            A.set_warp_backend(A.warp_affine_cv2)


class TestNativeJpeg:
    """Native libjpeg decoder vs cv2 (both libjpeg-based; IDCT may differ
    by a few counts)."""

    def _enc(self, img):
        import cv2
        ok, enc = cv2.imencode(".jpg", img[:, :, ::-1],
                               [cv2.IMWRITE_JPEG_QUALITY, 92])
        assert ok
        return enc.tobytes()

    def test_single_decode_matches_cv2(self):
        import cv2
        from tokenhmr_tpu.native import jpeg_decode
        rng = np.random.RandomState(0)
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        raw = self._enc(img)
        out = jpeg_decode(raw)
        if out is None:
            import pytest
            pytest.skip("libjpeg unavailable")
        ref = cv2.imdecode(np.frombuffer(raw, np.uint8),
                           cv2.IMREAD_COLOR)[:, :, ::-1]
        assert out.shape == ref.shape
        assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 2.0

    def test_batch_decode_threads(self):
        import cv2
        from tokenhmr_tpu.native import jpeg_decode_batch
        rng = np.random.RandomState(1)
        raws, refs = [], []
        for i in range(7):
            img = (rng.rand(40 + 8 * i, 64, 3) * 255).astype(np.uint8)
            raw = self._enc(img)
            raws.append(raw)
            refs.append(cv2.imdecode(np.frombuffer(raw, np.uint8),
                                     cv2.IMREAD_COLOR)[:, :, ::-1])
        raws.append(b"not a jpeg")
        outs = jpeg_decode_batch(raws, num_threads=3)
        if outs[0] is None:
            import pytest
            pytest.skip("libjpeg unavailable")
        assert outs[-1] is None  # corrupt member flagged, not crashed
        for o, r in zip(outs[:-1], refs):
            assert o.shape == r.shape
            assert np.mean(np.abs(o.astype(int) - r.astype(int))) < 2.0
