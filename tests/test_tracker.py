"""Tracker association tests."""
import numpy as np

from tokenhmr_tpu.track import IoUTracker
from tokenhmr_tpu.track.tracker import iou_matrix


class TestIoU:
    def test_matrix(self):
        a = np.array([[0, 0, 10, 10]], np.float32)
        b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
        m = iou_matrix(a, b)
        np.testing.assert_allclose(m[0, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(m[0, 1], 25 / 175, atol=1e-4)
        assert m[0, 2] == 0


class TestTracker:
    def test_stable_ids_moving_boxes(self):
        tr = IoUTracker(embed_weight=0.0)
        # two people moving right at different speeds
        ids_seen = []
        for t in range(10):
            boxes = np.array([
                [10 + 3 * t, 10, 50 + 3 * t, 100],
                [200 + 5 * t, 20, 260 + 5 * t, 120],
            ], np.float32)
            recs = tr.update(boxes)
            ids_seen.append([r["track_id"] for r in recs])
        assert all(ids == ids_seen[0] for ids in ids_seen)
        assert len(set(ids_seen[0])) == 2

    def test_new_track_on_appearance(self):
        tr = IoUTracker(embed_weight=0.0)
        r1 = tr.update(np.array([[0, 0, 50, 100]], np.float32))
        r2 = tr.update(np.array([[0, 0, 50, 100], [300, 0, 350, 100]], np.float32))
        assert r2[0]["track_id"] == r1[0]["track_id"]
        assert r2[1]["track_id"] != r1[0]["track_id"]

    def test_track_survives_occlusion(self):
        tr = IoUTracker(embed_weight=0.0, max_age=5)
        id0 = tr.update(np.array([[100, 100, 150, 200]], np.float32))[0]["track_id"]
        for _ in range(3):  # occluded frames
            tr.update(np.zeros((0, 4), np.float32))
        rec = tr.update(np.array([[102, 101, 152, 201]], np.float32))
        assert rec[0]["track_id"] == id0

    def test_track_expires(self):
        tr = IoUTracker(embed_weight=0.0, max_age=2)
        id0 = tr.update(np.array([[100, 100, 150, 200]], np.float32))[0]["track_id"]
        for _ in range(4):
            tr.update(np.zeros((0, 4), np.float32))
        rec = tr.update(np.array([[100, 100, 150, 200]], np.float32))
        assert rec[0]["track_id"] != id0

    def test_embedding_disambiguates_crossing(self):
        """Two crossing boxes with distinct embeddings keep their ids."""
        tr = IoUTracker(embed_weight=0.5, iou_thresh=0.1)
        ea = np.array([1.0, 0.0], np.float32)
        eb = np.array([0.0, 1.0], np.float32)
        # approach until heavily overlapping, embeddings constant
        first = tr.update(
            np.array([[0, 0, 60, 100], [120, 0, 180, 100]], np.float32),
            np.stack([ea, eb]))
        ids = [r["track_id"] for r in first]
        for t in range(1, 6):
            shift = 10 * t
            recs = tr.update(
                np.array([[0 + shift, 0, 60 + shift, 100],
                          [120 - shift, 0, 180 - shift, 100]], np.float32),
                np.stack([ea, eb]))
            assert [r["track_id"] for r in recs] == ids
