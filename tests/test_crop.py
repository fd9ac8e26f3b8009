"""Crop affine math vs cv2 golden behavior."""
import numpy as np
import pytest

from tokenhmr_tpu.ops import crop as C

cv2 = pytest.importorskip("cv2")


def _ref_trans(cx, cy, sw, sh, dw, dh, scale, rot):
    """cv2.getAffineTransform three-point construction (ref utils.py:81-128)."""
    src_w, src_h = sw * scale, sh * scale
    rot_rad = np.pi * rot / 180.0

    def rot2d(pt):
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs], dtype=np.float32)

    src_center = np.array([cx, cy], dtype=np.float32)
    src_down = rot2d(np.array([0, src_h * 0.5], dtype=np.float32))
    src_right = rot2d(np.array([src_w * 0.5, 0], dtype=np.float32))
    dst_center = np.array([dw * 0.5, dh * 0.5], dtype=np.float32)
    src = np.stack([src_center, src_center + src_down, src_center + src_right]).astype(np.float32)
    dst = np.stack(
        [dst_center, dst_center + np.array([0, dh * 0.5]), dst_center + np.array([dw * 0.5, 0])]
    ).astype(np.float32)
    return cv2.getAffineTransform(src, dst)


class TestCropAffine:
    @pytest.mark.parametrize("rot", [0.0, 15.0, -30.0, 90.0])
    @pytest.mark.parametrize("scale", [1.0, 1.3, 0.7])
    def test_matches_cv2_construction(self, rot, scale):
        got = C.gen_crop_affine(120.5, 88.25, 150.0, 200.0, 192, 256, scale, rot)
        exp = _ref_trans(120.5, 88.25, 150.0, 200.0, 192, 256, scale, rot)
        np.testing.assert_allclose(got, exp, atol=1e-4)

    def test_invert(self):
        t = C.gen_crop_affine(50, 60, 100, 120, 192, 256, 1.1, 25.0)
        ti = C.invert_affine(t)
        pts = np.random.RandomState(0).rand(10, 2) * 100
        back = C.transform_points_2d(ti, C.transform_points_2d(t, pts))
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_expand_to_aspect_ratio(self):
        # already taller than target -> widen
        out = C.expand_to_aspect_ratio([100, 400], (192, 256))
        np.testing.assert_allclose(out, [300, 400])
        # wider than target -> heighten
        out = C.expand_to_aspect_ratio([300, 100], (192, 256))
        np.testing.assert_allclose(out, [300, 400])
        assert np.asarray(C.expand_to_aspect_ratio([10, 20], None)).tolist() == [10, 20]

    def test_bbox_to_center_scale(self):
        boxes = np.array([[10, 20, 110, 220]], dtype=np.float32)
        center, scale = C.bbox_xyxy_to_center_scale(boxes)
        np.testing.assert_allclose(center, [[60, 120]])
        np.testing.assert_allclose(scale, [[2.5 * 100 / 200, 2.5 * 200 / 200]])

    def test_warp_golden_vs_cv2(self):
        """Full crop pipeline: our affine + cv2.warpAffine == reference warp."""
        rng = np.random.RandomState(42)
        img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
        trans = C.gen_crop_affine(160, 120, 180, 240, 192, 256, 1.0, 10.0)
        patch = cv2.warpAffine(img, trans, (192, 256), flags=cv2.INTER_LINEAR)
        ref = cv2.warpAffine(img, _ref_trans(160, 120, 180, 240, 192, 256, 1.0, 10.0), (192, 256), flags=cv2.INTER_LINEAR)
        assert np.mean(np.abs(patch.astype(int) - ref.astype(int))) < 0.5
