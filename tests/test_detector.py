"""Learned person detector: decode correctness, loss convergence (overfit),
NNDetector end-to-end via the checkpoint roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tokenhmr_tpu.models.detector import (
    DetectorConfig, PersonDetector, decode_detections, detector_loss,
    splat_targets,
)


class TestDecode:
    def test_splat_and_decode_roundtrip(self):
        """A synthetic ideal network output decodes back to the gt box."""
        cfg = DetectorConfig(img_size=64, base=8, max_det=4)
        box = np.array([[12.0, 20.0, 44.0, 60.0]])
        tgt = splat_targets(box, cfg)
        # build ideal logits from targets: +10 at peak, -10 elsewhere
        heat = np.where(tgt["mask"] > 0, 10.0, -10.0)[None, ..., None]
        out = {"heat": jnp.asarray(heat),
               "wh": jnp.asarray(tgt["wh"][None]),
               "off": jnp.asarray(tgt["off"][None])}
        boxes, scores = decode_detections(out, cfg)
        assert float(scores[0, 0]) > 0.99
        np.testing.assert_allclose(np.asarray(boxes[0, 0]), box[0], atol=1.0)
        assert float(scores[0, 1]) < 0.01  # single detection only

    def test_two_people(self):
        cfg = DetectorConfig(img_size=64, base=8, max_det=4)
        gt = np.array([[4.0, 4.0, 24.0, 40.0], [36.0, 20.0, 60.0, 62.0]])
        tgt = splat_targets(gt, cfg)
        heat = np.where(tgt["mask"] > 0, 10.0, -10.0)[None, ..., None]
        out = {"heat": jnp.asarray(heat), "wh": jnp.asarray(tgt["wh"][None]),
               "off": jnp.asarray(tgt["off"][None])}
        boxes, scores = decode_detections(out, cfg)
        got = np.asarray(boxes[0][np.asarray(scores[0]) > 0.5])
        assert len(got) == 2
        # match by center x
        got = got[np.argsort(got[:, 0])]
        np.testing.assert_allclose(got, gt, atol=1.0)


class TestTraining:
    def test_overfit_tiny(self):
        """Loss decreases and the trained net finds the memorized people."""
        import optax
        from tokenhmr_tpu.data.synth_people import make_composite

        cfg = DetectorConfig(img_size=64, base=8, max_det=4)
        rng = np.random.default_rng(0)
        imgs, tgts, gts = [], [], []
        for _ in range(8):
            img, bx = make_composite(rng, 64, max_people=1)
            imgs.append(img.astype(np.float32) / 255.0)
            tgts.append(splat_targets(bx, cfg))
            gts.append(bx)
        imgs = jnp.asarray(np.stack(imgs))
        tgt = {k: jnp.asarray(np.stack([t[k] for t in tgts]))
               for k in tgts[0]}

        model = PersonDetector(cfg)
        params = model.init(jax.random.PRNGKey(0), imgs[:1])["params"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                return detector_loss(model.apply({"params": p}, imgs), tgt)
            (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            u, opt_state2 = opt.update(g, opt_state, params)
            return optax.apply_updates(params, u), opt_state2, m

        first = None
        for it in range(150):
            params, opt_state, m = step(params, opt_state)
            if first is None:
                first = float(m["total"])
        last = float(m["total"])
        assert last < first * 0.5, (first, last)

        boxes, scores = decode_detections(
            model.apply({"params": params}, imgs), cfg)
        # top detection overlaps the gt on most memorized images
        hits = 0
        for i, gt in enumerate(gts):
            if len(gt) == 0:
                continue
            b = np.asarray(boxes[i, 0])
            g = gt[0]
            ix = max(0, min(b[2], g[2]) - max(b[0], g[0]))
            iy = max(0, min(b[3], g[3]) - max(b[1], g[1]))
            inter = ix * iy
            union = ((b[2]-b[0])*(b[3]-b[1]) + (g[2]-g[0])*(g[3]-g[1]) - inter)
            if inter / max(union, 1e-6) > 0.3:
                hits += 1
        assert hits >= len(gts) // 2, hits


class TestNNDetector:
    def test_checkpoint_roundtrip_and_interface(self, tmp_path):
        from tokenhmr_tpu.data.detect import make_detector
        from tokenhmr_tpu.train.checkpoint import save_detector_checkpoint

        cfg = DetectorConfig(img_size=64, base=8)
        model = PersonDetector(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
        path = str(tmp_path / "det.npz")
        save_detector_checkpoint(path, params, cfg)
        det = make_detector("nn", ckpt=path)
        out = det(np.zeros((100, 140, 3), np.uint8))
        assert out.shape[1] == 5  # (N, xyxy+score) contract

    def test_wbf_fuses_coordinates_and_demotes_lone_views(self):
        """Weighted box fusion: overlapping boxes average with score
        weights (better localization than NMS keep-one), confidence is
        the max member scaled by cross-view agreement."""
        from tokenhmr_tpu.data.detect import wbf_xyxy

        boxes = np.array([[10, 10, 50, 50],
                          [14, 14, 54, 54],     # same person, shifted
                          [200, 200, 240, 240]], np.float32)  # lone FP
        scores = np.array([0.9, 0.3, 0.8], np.float32)
        out = wbf_xyxy(boxes, scores, iou_thresh=0.5, n_views=2)
        assert out.shape == (2, 5)
        fused = out[np.argmin(out[:, 0])]       # the person cluster
        exp = (boxes[0] * 0.9 + boxes[1] * 0.3) / 1.2
        np.testing.assert_allclose(fused[:4], exp, atol=1e-4)
        assert fused[4] == pytest.approx(0.9)   # 2 members: no demotion
        lone = out[np.argmax(out[:, 0])]
        assert lone[4] == pytest.approx(0.4)    # 1 of 2 views: halved
        # n_views=1 (the tiled default): no demotion anywhere
        out1 = wbf_xyxy(boxes, scores, iou_thresh=0.5, n_views=1)
        assert np.max(out1[:, 4]) == pytest.approx(0.9)
        assert np.min(out1[:, 4]) == pytest.approx(0.8)

    def test_tiled_inference_merges_views(self, tmp_path):
        """--detector-tiles path: tile boxes map back to source pixels,
        NMS-merge with the full-frame pass, stay inside the image."""
        from tokenhmr_tpu.data.detect import NNDetector
        from tokenhmr_tpu.train.checkpoint import save_detector_checkpoint

        cfg = DetectorConfig(img_size=64, base=8)
        model = PersonDetector(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
        path = str(tmp_path / "det.npz")
        save_detector_checkpoint(path, params, cfg)
        det = NNDetector(path, score_thresh=0.0, tiles=True)
        img = (np.random.default_rng(0)
               .integers(0, 255, (90, 130, 3)).astype(np.uint8))
        out = det(img)
        assert out.ndim == 2 and out.shape[1] == 5
        if len(out):
            assert (out[:, 0] >= 0).all() and (out[:, 2] <= 130).all()
            assert (out[:, 1] >= 0).all() and (out[:, 3] <= 90).all()
        # merged output never exceeds the un-NMS'd union of the 5 views
        det_plain = NNDetector(path, score_thresh=0.0)
        n_single = len(det_plain(img))
        assert len(out) <= 5 * max(n_single, 1) + 5


def test_heldout_composite_style_is_distinct():
    """The generalization rig's held-out distribution is generated and
    differs from the training distribution (disjoint generator params)."""
    from tokenhmr_tpu.data.synth_people import make_composite

    rng = np.random.default_rng(5)
    img_t, boxes_t = make_composite(rng, 128, style="train")
    rng = np.random.default_rng(5)
    img_h, boxes_h = make_composite(rng, 128, style="heldout")
    assert img_t.shape == img_h.shape == (128, 128, 3)
    assert boxes_h.shape[1] == 4 if len(boxes_h) else True
    # same seed, different generator params -> different images
    assert not np.array_equal(img_t, img_h)


def test_wh_log_splat_and_decode_roundtrip():
    """log-space size head: targets store log(wh), decode exponentiates —
    boxes still round-trip exactly (r3 scale-invariant parameterization)."""
    cfg = DetectorConfig(img_size=64, base=8, max_det=4, wh_log=True)
    box = np.array([[12.0, 20.0, 44.0, 60.0]])
    tgt = splat_targets(box, cfg)
    heat = np.where(tgt["mask"] > 0, 10.0, -10.0)[None, ..., None]
    out = {"heat": jnp.asarray(heat), "wh": jnp.asarray(tgt["wh"][None]),
           "off": jnp.asarray(tgt["off"][None])}
    boxes, scores = decode_detections(out, cfg)
    np.testing.assert_allclose(np.asarray(boxes[0, 0]), box[0], atol=1.0)
    # pre-r3 checkpoints omit the field -> default False keeps old decode
    d = DetectorConfig(img_size=64, base=8)
    assert d.wh_log is False


def test_cache_stream_flip_box_consistency():
    """--cache path: flip + photometric re-draws keep targets consistent.

    The flipped boxes must splat a center column mirrored from the
    unflipped one, and the stream must yield normalized images + stacked
    targets of the right shapes."""
    from cli.train_detector import batch_stream

    cfg = DetectorConfig(img_size=64, base=8)
    stream = batch_stream(cfg, batch_size=4, seed=3, cache_n=8)
    imgs, tgt = next(stream)
    assert imgs.shape == (4, 64, 64, 3) and imgs.dtype == np.float32
    assert 0.0 <= imgs.min() and imgs.max() <= 1.0
    h = cfg.out_hw
    assert tgt["heat"].shape == (4, h, h)
    assert tgt["wh"].shape == (4, h, h, 2)
    assert tgt["off"].shape == (4, h, h, 2)
    assert tgt["mask"].shape == (4, h, h)

    # direct flip math check: mirrored boxes splat mirrored center cells
    box = np.array([[8.0, 16.0, 24.0, 40.0]])
    flipped = box.copy()
    flipped[:, [0, 2]] = cfg.img_size - 1 - box[:, [2, 0]]
    t0 = splat_targets(box, cfg)
    t1 = splat_targets(flipped, cfg)
    i0, j0 = np.unravel_index(t0["mask"].argmax(), t0["mask"].shape)
    i1, j1 = np.unravel_index(t1["mask"].argmax(), t1["mask"].shape)
    assert i0 == i1  # same row
    # mirrored center column (within one cell of the exact mirror)
    assert abs((h - 1 - j0) - j1) <= 1
    # identical box sizes
    np.testing.assert_allclose(t0["wh"][i0, j0], t1["wh"][i1, j1], atol=1e-5)


class TestSynthScenes:
    """On-device multi-person SMPL scenes (data/synth_scenes.py)."""

    @pytest.fixture(scope="class")
    def model(self):
        from tokenhmr_tpu.models.humanoid import humanoid_smpl_model
        return humanoid_smpl_model(num_vertices=600)

    def test_shapes_boxes_valid_contract(self, model):
        from tokenhmr_tpu.data.synth_scenes import make_scene_batch_fn

        S, P, B = 96, 3, 3
        fn = jax.jit(make_scene_batch_fn(model, size=S, max_people=P),
                     static_argnums=1)
        body, alpha, boxes, valid = fn(jax.random.PRNGKey(7), B)
        assert body.shape == (B, S, S, 3)
        assert alpha.shape == (B, S, S, 1)
        assert boxes.shape == (B, P, 4) and valid.shape == (B, P)
        body, alpha = np.asarray(body), np.asarray(alpha)
        boxes, valid = np.asarray(boxes), np.asarray(valid)
        assert np.isfinite(body).all() and np.isfinite(boxes).all()
        assert 0.0 <= alpha.min() and alpha.max() <= 1.0
        assert alpha.max() > 0.5          # somebody rendered
        assert set(np.unique(valid)) <= {0.0, 1.0}
        assert valid.sum() >= B           # >=1 active person per scene
        v = valid > 0
        assert (boxes[v] >= 0).all() and (boxes[v] <= S - 1).all()
        assert ((boxes[v][:, 2] - boxes[v][:, 0]) > 8).all()
        assert ((boxes[v][:, 3] - boxes[v][:, 1]) > 8).all()

    def test_deterministic_and_people_inside_boxes(self, model):
        from tokenhmr_tpu.data.synth_scenes import make_scene_batch_fn

        S = 96
        fn = jax.jit(make_scene_batch_fn(model, size=S, max_people=2),
                     static_argnums=1)
        a = fn(jax.random.PRNGKey(3), 2)
        b = fn(jax.random.PRNGKey(3), 2)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        body, alpha, boxes, valid = map(np.asarray, a)
        # essentially all rendered alpha mass lies inside the union of the
        # projected boxes (dilated by the 3x3 splat footprint).  Uses all
        # positive-area boxes, not just `valid` ones: an active person
        # clipped to an edge sliver (<8px) renders but carries no GT box.
        for i in range(2):
            mask = np.zeros((S, S), bool)
            for bx in boxes[i]:
                if bx[2] > bx[0] and bx[3] > bx[1]:
                    x0, y0, x1, y1 = (int(bx[0]) - 2, int(bx[1]) - 2,
                                      int(np.ceil(bx[2])) + 3,
                                      int(np.ceil(bx[3])) + 3)
                    mask[max(y0, 0):y1, max(x0, 0):x1] = True
            outside = alpha[i, :, :, 0] * (~mask)
            assert outside.sum() <= 0.02 * alpha[i].sum() + 1e-6

    def test_smpl_cache_stream(self, model, monkeypatch):
        """--smpl-frac cache path yields the standard batch contract."""
        import tokenhmr_tpu.models.humanoid as humanoid

        from cli.train_detector import batch_stream

        monkeypatch.setattr(humanoid, "humanoid_smpl_model",
                            lambda **kw: model)
        cfg = DetectorConfig(img_size=64, base=8)
        stream = batch_stream(cfg, batch_size=2, seed=5, cache_n=6,
                              smpl_frac=1.0)
        imgs, tgt = next(stream)
        assert imgs.shape == (2, 64, 64, 3) and imgs.dtype == np.float32
        assert 0.0 <= imgs.min() and imgs.max() <= 1.0
        h = cfg.out_hw
        assert tgt["heat"].shape == (2, h, h)
        assert tgt["mask"].shape == (2, h, h)


class TestRealPhotoEvalMatching:
    """Greedy matching/reporting logic of scripts/real_photo_eval.py."""

    def test_iou_and_greedy_assignment(self):
        import scripts.real_photo_eval as rpe

        assert rpe.iou_xyxy([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
        assert rpe.iou_xyxy([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
        # a high-score bad box must not steal the GT from a better match:
        # scoring is greedy by confidence (COCO-style), so the high-score
        # box claims GT only if it overlaps >= 0.1
        assert rpe.iou_xyxy([0, 0, 4, 4], [0, 0, 10, 10]) == pytest.approx(
            16 / 100)


class TestRealPhotoRigViews:
    def test_all_views_load_with_valid_gt(self):
        """Every rig view loads (or is skipped cleanly) and its GT boxes
        are well-formed and inside the view (VERDICT r3 #4: n=7 rig)."""
        import scripts.real_photo_eval as rpe

        n_people = 0
        n_views = 0
        for name in rpe.ITEMS:
            loaded = rpe.load_view(name)
            if loaded is None:   # source absent in this environment
                continue
            img, gt = loaded
            H, W = img.shape[:2]
            n_views += 1
            for x0, y0, x1, y1 in gt:
                assert 0 <= x0 < x1 <= W and 0 <= y0 < y1 <= H, (name, gt)
                assert (x1 - x0) * (y1 - y0) >= 30 * 30, (name, "degenerate")
                n_people += 1
        # the 3 matplotlib/reference sources in this container give 6
        # views / 7 people; allow partial environments but require growth
        # beyond the r3 n=3 whenever the reference demo images exist
        import os
        if os.path.isdir(rpe.REF_IMAGES):
            assert n_people >= 6 and n_views >= 5
