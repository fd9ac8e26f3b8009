"""Temporal SMPL smoothing (track/smoothing.py) + track CLI smoke."""
import numpy as np
import pytest

from tokenhmr_tpu.track.smoothing import (OneEuroFilter, SMPLSmoother,
                                          _6d_to_mat, _mat_to_6d)


def _random_rotmats(rng, n):
    # random rotations via QR (determinant fixed to +1)
    q, _ = np.linalg.qr(rng.randn(n, 3, 3))
    det = np.linalg.det(q)
    q[:, :, 0] *= np.sign(det)[:, None]
    return q.astype(np.float32)


class TestOneEuro:
    def test_constant_signal_passthrough(self):
        f = OneEuroFilter(freq=30.0)
        x = np.full((5,), 2.5, np.float32)
        for _ in range(10):
            y = f(x)
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_reduces_jitter_variance(self):
        rng = np.random.RandomState(0)
        f = OneEuroFilter(freq=30.0, min_cutoff=1.0, beta=0.0)
        clean = 1.5  # still subject: jitter suppression is the spec here
        noisy = clean + rng.randn(120) * 0.05
        out = np.array([f(np.array([v]))[0] for v in noisy])
        raw = np.mean((noisy[20:] - clean) ** 2)
        smo = np.mean((out[20:] - clean) ** 2)
        assert smo < raw * 0.3, (smo, raw)

    def test_tracks_fast_motion(self):
        """beta adaptation keeps lag bounded on a fast ramp."""
        f = OneEuroFilter(freq=30.0, min_cutoff=1.0, beta=0.5)
        t = np.arange(60, dtype=np.float32)
        sig = t * 0.5  # fast ramp
        out = np.array([f(np.array([v]))[0] for v in sig])
        assert abs(out[-1] - sig[-1]) < 0.5


class TestRotation6D:
    def test_roundtrip(self):
        rng = np.random.RandomState(1)
        R = _random_rotmats(rng, 8)
        R2 = _6d_to_mat(_mat_to_6d(R))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_filtered_output_is_valid_rotation(self):
        rng = np.random.RandomState(2)
        x = _mat_to_6d(_random_rotmats(rng, 4)) + rng.randn(4, 6) * 0.3
        R = _6d_to_mat(x.astype(np.float32))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


class TestSMPLSmoother:
    def test_per_track_state_is_independent(self):
        rng = np.random.RandomState(3)
        sm = SMPLSmoother(freq=30.0)
        go = _random_rotmats(rng, 1)
        bp = _random_rotmats(rng, 23)
        b, c = rng.randn(10).astype(np.float32), rng.randn(3).astype(np.float32)
        # track 1 sees the pose for several frames; track 2 starts fresh
        for _ in range(5):
            sm.update(1, go, bp, b, c)
        g2, bp2, b2, c2 = sm.update(2, go, bp, b, c)
        np.testing.assert_allclose(b2, b, atol=1e-6)  # first frame = identity
        assert set(sm._filters) == {1, 2}
        sm.prune([2])
        assert set(sm._filters) == {2}

    def test_smooths_noisy_rotations(self):
        rng = np.random.RandomState(4)
        sm = SMPLSmoother(freq=30.0, min_cutoff=0.5, beta=0.0)
        base = _random_rotmats(rng, 24)
        b = np.zeros(10, np.float32)
        c = np.zeros(3, np.float32)
        outs = []
        for _ in range(40):
            noisy6 = _mat_to_6d(base) + rng.randn(24, 6) * 0.05
            R = _6d_to_mat(noisy6.astype(np.float32))
            g, bp, _, _ = sm.update(7, R[:1], R[1:], b, c)
            outs.append(np.concatenate([g, bp], axis=0))
        # late outputs hug the clean base rotation better than the noise does
        err = np.abs(_mat_to_6d(outs[-1]) - _mat_to_6d(base)).mean()
        assert err < 0.03


@pytest.mark.slow
def test_track_cli_smooth_smoke(tmp_path):
    """cli.track --smooth end-to-end on a tiny synthetic video."""
    import cv2
    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.RandomState(0)
    for _ in range(3):
        w.write(rng.randint(0, 255, (96, 128, 3), dtype=np.uint8))
    w.release()

    from cli.track import main
    out = tmp_path / "out"
    main(["--video", vid, "--out-folder", str(out), "--tiny",
          "--platform", "cpu", "--smooth", "--render"])
    assert (out / "tracks.pkl").exists()
    assert (out / "tracked.mp4").exists()
