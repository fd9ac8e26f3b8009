"""Detector interface, NMS, PCK accuracy, profiling utils."""
import json

import numpy as np
import pytest

from tokenhmr_tpu.data.detect import (
    FileBoxSource, FullFrameDetector, make_detector, nms_xyxy,
)
from tokenhmr_tpu.utils.pck import keypoint_pck_accuracy
from tokenhmr_tpu.utils.profiling import PhaseTimer


class TestNMS:
    def test_suppresses_overlaps(self):
        boxes = np.array([[0, 0, 100, 100], [10, 10, 110, 110],
                          [200, 200, 300, 300]], np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        keep = nms_xyxy(boxes, scores, iou_thresh=0.5)
        assert list(keep) == [0, 2]

    def test_empty(self):
        assert len(nms_xyxy(np.zeros((0, 4)), np.zeros(0))) == 0

    def test_keeps_all_disjoint(self):
        boxes = np.array([[0, 0, 10, 10], [20, 0, 30, 10]], np.float32)
        keep = nms_xyxy(boxes, np.array([0.5, 0.9], np.float32))
        assert sorted(keep.tolist()) == [0, 1]


class TestDetectors:
    def test_full_frame(self):
        img = np.zeros((100, 200, 3), np.uint8)
        boxes = FullFrameDetector()(img)
        np.testing.assert_allclose(boxes, [[0, 0, 200, 100, 1.0]])

    def test_file_source(self, tmp_path):
        path = str(tmp_path / "boxes.json")
        with open(path, "w") as f:
            json.dump({"a.jpg": [[1, 2, 3, 4]], "b.jpg": []}, f)
        src = FileBoxSource(path)
        img = np.zeros((10, 10, 3), np.uint8)
        out = src.for_image("/some/dir/a.jpg")(img)
        np.testing.assert_allclose(out, [[1, 2, 3, 4, 1.0]])
        assert src.for_image("b.jpg")(img).shape == (0, 5)
        assert src.for_image("missing.jpg")(img).shape == (0, 5)

    def test_make_detector_unknown(self):
        with pytest.raises(ValueError, match="unknown detector"):
            make_detector("nope")


class TestPCK:
    def test_perfect_predictions(self):
        pred = np.random.RandomState(0).rand(4, 10, 2).astype(np.float32)
        mask = np.ones((4, 10), bool)
        norm = np.ones((4, 2), np.float32)
        acc, avg, cnt = keypoint_pck_accuracy(pred, pred.copy(), mask, 0.05, norm)
        assert avg == 1.0 and cnt == 10

    def test_threshold_behavior(self):
        pred = np.zeros((1, 2, 2), np.float32)
        gt = np.array([[[0.0, 0.0], [1.0, 0.0]]], np.float32)
        mask = np.ones((1, 2), bool)
        norm = np.ones((1, 2), np.float32)
        acc, avg, cnt = keypoint_pck_accuracy(pred, gt, mask, 0.5, norm)
        assert acc[0] == 1.0 and acc[1] == 0.0 and avg == 0.5

    def test_masked_out(self):
        pred = np.zeros((1, 2, 2), np.float32)
        gt = np.ones((1, 2, 2), np.float32)
        mask = np.zeros((1, 2), bool)
        acc, avg, cnt = keypoint_pck_accuracy(
            pred, gt, mask, 0.5, np.ones((1, 2), np.float32))
        assert cnt == 0


class TestProfiling:
    def test_phase_timer(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        rep = t.report()
        assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
        assert "a:" in str(t)
