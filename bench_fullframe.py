"""Full-frame end-to-end + host-feed benchmarks (VERDICT r2 #5).

Two modes, each printing ONE JSON line:

  python bench_fullframe.py
      frames -> persons/sec through the serving pipeline (serve.py):
      host JPEG decode (native libjpeg) -> person detector -> box->affine
      -> ONE jitted device program (crop-warp + ViT-H + head + PoseVQ
      decode + SMPL + full-image cameras).  Ref hot path:
      /root/reference/tokenhmr/demo.py:63-90, vitdet_dataset.py:44-88.

  python bench_fullframe.py --host-feed
      sustained crops/sec/core the HOST input pipeline can produce
      (JPEG decode + crop-warp + normalize via native/warp.cpp), i.e. the
      feed budget behind the device crops/s number.  The dev container
      has ONE core; the JSON reports per-core rate and the core count
      needed to saturate one chip at the device rate.
"""
import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_frames(n: int, size: int = 512, seed: int = 0):
    """Synthetic multi-person frames (procedural composites) + JPEG bytes."""
    import cv2

    from tokenhmr_tpu.data.synth_people import make_composite

    rng = np.random.default_rng(seed)
    frames, jpegs, gt_boxes = [], [], []
    for _ in range(n):
        img, boxes = make_composite(rng, size, max_people=4)
        frames.append(img)
        ok, buf = cv2.imencode(".jpg", img[:, :, ::-1],
                               [cv2.IMWRITE_JPEG_QUALITY, 92])
        assert ok
        jpegs.append(buf.tobytes())
        gt_boxes.append(boxes)
    return frames, jpegs, gt_boxes


def bench_fullframe(args):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G
    from tokenhmr_tpu.native import jpeg_decode
    from tokenhmr_tpu.serve import FullFramePipeline

    cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=1)
    # same inference options as the headline bench
    import dataclasses as dc
    cfg = dc.replace(cfg, vit=dc.replace(
        cfg.vit, quant=None, dtype=jnp.bfloat16))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    frames, jpegs, gt_boxes = make_frames(args.frames, args.frame_size)

    # detector: trained synth ckpt if present, else GT boxes (boxes-in is
    # the demo parity surface; ref demo.py takes detectron2 boxes)
    detector = None
    det_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "artifacts_det", "person_detector_synth.npz")
    if not args.gt_boxes and os.path.exists(det_path):
        from tokenhmr_tpu.data.detect import NNDetector

        detector = NNDetector(det_path)

    pipe = FullFramePipeline(params, frozen, cfg, smpl_model)

    def frame_boxes(i, img, dets=None):
        if dets is not None:
            det = dets
            boxes = det[det[:, 4] > 0.3][:, :4] if len(det) else None
            if boxes is None or len(boxes) == 0:
                boxes = gt_boxes[i]
        else:
            boxes = gt_boxes[i]
        return np.asarray(boxes, np.float32)

    def run_once_perframe():
        persons = 0
        for i in range(len(jpegs)):
            img = jpeg_decode(jpegs[i])
            if img is None:
                img = frames[i]
            dets = detector(img) if detector is not None else None
            boxes = frame_boxes(i, img, dets)
            if len(boxes) == 0:
                continue
            out = pipe(img, boxes)
            persons += len(out["pred_vertices"])
        return persons

    def run_once_batched():
        # cross-frame dynamic batching (serve.py run_frames): decode all,
        # ONE batched detector dispatch, ONE batched model dispatch
        imgs = []
        for i in range(len(jpegs)):
            img = jpeg_decode(jpegs[i])
            imgs.append(img if img is not None else frames[i])
        dets = (detector.detect_batch(imgs) if detector is not None
                else [None] * len(imgs))
        boxes_list = [frame_boxes(i, imgs[i], dets[i])
                      for i in range(len(imgs))]
        outs = pipe.run_frames(imgs, boxes_list)
        return sum(len(o["pred_vertices"]) for o in outs if o)

    run_once = run_once_perframe if args.per_frame else run_once_batched

    run_once()  # compile all touched buckets
    t0 = time.perf_counter()
    total = 0
    for _ in range(args.iters):
        total += run_once()
    dt = time.perf_counter() - t0
    n_frames = args.iters * len(jpegs)
    print(json.dumps({
        "metric": "fullframe_persons_per_sec",
        "value": round(total / dt, 2),
        "unit": "persons/sec (jpeg->detect->warp->vertices, full frames)",
        "frames_per_sec": round(n_frames / dt, 2),
        "persons_per_frame": round(total / n_frames, 2),
        "detector": "nn" if detector is not None else "gt-boxes",
        "frame_size": args.frame_size,
        "mode": "per-frame" if args.per_frame else "batched-window",
    }))


def bench_host_feed(args):
    """Host-side preprocessing budget: JPEG decode + warp + normalize."""
    import cv2

    from tokenhmr_tpu.native import jpeg_decode, warp_normalize
    from tokenhmr_tpu.ops.crop import (bbox_xyxy_to_center_scale,
                                       expand_to_aspect_ratio)
    from tokenhmr_tpu.ops.warp import crop_affines_for_boxes

    frames, jpegs, gt_boxes = make_frames(args.frames, args.frame_size)
    mean = np.array([0.485, 0.456, 0.406], np.float32) * 255
    std = np.array([0.229, 0.224, 0.225], np.float32) * 255

    # fixed plausible crop affine per frame
    work = []
    for img, boxes in zip(frames, gt_boxes):
        if len(boxes) == 0:
            boxes = np.asarray([[64, 64, 300, 448]], np.float32)
        centers, scales = bbox_xyxy_to_center_scale(boxes[:, :4])
        sizes = np.array([
            expand_to_aspect_ratio(s * 200.0, (192, 256)).max()
            for s in scales], np.float32)
        affines = crop_affines_for_boxes(centers, sizes, 256)
        work.append(affines)

    def run_once():
        crops = 0
        for i in range(len(jpegs)):
            img = jpeg_decode(jpegs[i])
            if img is None:
                img = cv2.imdecode(np.frombuffer(jpegs[i], np.uint8),
                                   cv2.IMREAD_COLOR)[:, :, ::-1]
            for aff in work[i]:
                out = warp_normalize(img, aff, (256, 256),
                                     np.ones(3, np.float32), mean, std)
                crops += 1
        return crops

    n = run_once()
    t0 = time.perf_counter()
    total = 0
    for _ in range(args.iters):
        total += run_once()
    dt = time.perf_counter() - t0
    per_core = total / dt
    device_rate = args.device_rate
    print(json.dumps({
        "metric": "host_feed_crops_per_sec_per_core",
        "value": round(per_core, 2),
        "unit": "crops/sec/core (jpeg decode + native warp + normalize)",
        "cores_to_saturate_chip": round(device_rate / per_core, 2),
        "assumed_device_crops_per_sec": device_rate,
        "note": "dev container has 1 core; production hosts scale linearly "
                "with the procs loader (data/loader.py)",
    }))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host-feed", action="store_true")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--frame-size", type=int, default=512)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--gt-boxes", action="store_true")
    p.add_argument("--per-frame", action="store_true",
                   help="one dispatch per frame (no cross-frame batching)")
    p.add_argument("--device-rate", type=float, default=2000.0)
    args = p.parse_args()
    if args.host_feed:
        bench_host_feed(args)
    else:
        bench_fullframe(args)


if __name__ == "__main__":
    main()
