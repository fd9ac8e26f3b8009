"""Video tracking CLI: per-frame batched TokenHMR + temporal ID association.

Capabilities of ref `tokenhmr/track.py` (PHALP-driven video tracking with
TokenHMR as the pose predictor): video in -> per-frame detection -> batched
crops -> one jitted forward -> IoU/pose-embedding tracker -> overlay video
+ per-track pose records (pkl).

Usage:
  python -m cli.track --video in.mp4 --out-folder out \
      --checkpoint ckpt --tokenizer-checkpoint tok.pth --smpl-model smpl.pkl
Smoke:
  python -m cli.track --video in.mp4 --out-folder out --tiny --platform cpu
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video", required=True)
    p.add_argument("--out-folder", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tokenizer-checkpoint", default=None)
    p.add_argument("--smpl-model", default=None)
    p.add_argument("--detector", default="full_frame",
                   choices=["full_frame", "file", "hog", "nn"])
    p.add_argument("--detector-thresh", type=float, default=0.35,
                   help="nn detector score threshold (real photos often "
                        "want 0.15-0.25 with an undertrained checkpoint)")
    p.add_argument("--detector-tiles", action="store_true",
                   help="multi-scale test-time tiling for the nn detector "
                        "(2x2 zoom tiles + full frame, NMS-merged: better "
                        "small-person recall at ~5x detector compute)")
    p.add_argument("--detector-ckpt", default=None,
                   help="npz from cli/train_detector.py (--detector nn)")
    p.add_argument("--boxes-file", default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--render", action="store_true")
    p.add_argument("--smooth", action="store_true",
                   help="One-Euro temporal smoothing of SMPL params per "
                        "track (track/smoothing.py); verts are recomputed "
                        "from the smoothed params on device")
    p.add_argument("--smooth-min-cutoff", type=float, default=1.0)
    p.add_argument("--smooth-beta", type=float, default=0.5)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="W8A8 int8 ViT inference with one-shot calibration "
                        "(fused TPU kernels; speed knob)")
    p.add_argument("--merge", default=None, metavar="SCHED",
                   help="ToMe token merging, e.g. '6:32,12:32,18:32,24:32'")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import cv2

    from tokenhmr_tpu.data.augment import DEFAULT_MEAN, DEFAULT_STD, generate_image_patch
    from tokenhmr_tpu.data.detect import make_detector
    from tokenhmr_tpu.models.tokenhmr import forward_step
    from tokenhmr_tpu.ops.crop import bbox_xyxy_to_center_scale, expand_to_aspect_ratio
    from tokenhmr_tpu.ops.projection import cam_crop_to_full
    from tokenhmr_tpu.track import IoUTracker
    from tokenhmr_tpu.utils.render import overlay_mesh_on_image

    mean_params = None
    if args.tiny or args.checkpoint is None:
        import __graft_entry__ as G

        cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=1, tiny=args.tiny)
    else:
        from tokenhmr_tpu.convert.load import load_tokenhmr_checkpoint
        from tokenhmr_tpu.models import smpl as S

        cfg, params, frozen, mean_params = load_tokenhmr_checkpoint(
            args.checkpoint, tokenizer_path=args.tokenizer_checkpoint)
        smpl_model = S.load_smpl_model(args.smpl_model)

    crop_size = max(cfg.vit.img_size)

    import dataclasses as dc
    if args.quant:
        cfg = dc.replace(cfg, vit=dc.replace(cfg.vit, quant=args.quant))
    if args.merge:
        sched = tuple(tuple(int(v) for v in part.split(":"))
                      for part in args.merge.split(","))
        cfg = dc.replace(cfg, vit=dc.replace(cfg.vit, merge_schedule=sched))
    def ensure_calibrated(crops_f32):
        # one-shot calibration on the FIRST real crops -> static scales +
        # pre-quantized weights (random-noise calibration underestimates
        # real activation ranges and clips the static int8 path)
        nonlocal params
        if args.quant != "int8" or "backbone_quant" in params:
            return
        from tokenhmr_tpu.models.vit import ViT
        ccfg = dc.replace(cfg.vit, quant="calib")
        params = dict(params)
        params["backbone_quant"] = jax.jit(
            lambda p, im: ViT(ccfg).apply({"params": p["backbone"]}, im,
                                          mutable=["quant"])[1]["quant"]
        )(params, jnp.asarray(crops_f32))

    @jax.jit
    def model_forward(params, img):
        out = forward_step(params, frozen, cfg, smpl_model, img,
                           mean_params=mean_params)
        return (out["pred_vertices"], out["pred_cam"],
                out["pred_smpl_params"]["betas"],
                out["pred_smpl_params"]["body_pose"],
                out["pred_smpl_params"]["global_orient"])

    smoother = None
    if args.smooth:
        from tokenhmr_tpu.models.smpl import smpl_openpose_forward
        from tokenhmr_tpu.track.smoothing import SMPLSmoother

        @jax.jit
        def smpl_forward(go, bp, betas):
            return smpl_openpose_forward(smpl_model, betas, go, bp)["vertices"]

    detector = make_detector(args.detector, args.boxes_file,
                             ckpt=args.detector_ckpt,
                             tiles=args.detector_tiles,
                             score_thresh=args.detector_thresh)
    tracker = IoUTracker()
    os.makedirs(args.out_folder, exist_ok=True)

    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise IOError(f"cannot open video {args.video}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 24
    if args.smooth:
        smoother = SMPLSmoother(freq=float(fps),
                                min_cutoff=args.smooth_min_cutoff,
                                beta=args.smooth_beta)
    writer = None
    frame_idx = 0
    all_records = []

    while True:
        ok, frame_bgr = cap.read()
        if not ok:
            break
        frame_idx += 1
        if args.max_frames and frame_idx > args.max_frames:
            break
        img = frame_bgr[:, :, ::-1]
        H, W = img.shape[:2]
        boxes = detector(img)
        frame_records = []
        if len(boxes):
            centers, scales = bbox_xyxy_to_center_scale(boxes[:, :4])
            crops, sizes = [], []
            for c, s in zip(centers, scales):
                wh = expand_to_aspect_ratio(s * 200.0, (192, 256))
                size = float(wh.max())
                patch, _ = generate_image_patch(
                    img, c[0], c[1], size, size, crop_size, crop_size,
                    False, 1.0, 0.0)
                crops.append((patch.astype(np.float32) - DEFAULT_MEAN) / DEFAULT_STD)
                sizes.append(size)
            ensure_calibrated(np.stack(crops))
            verts, cams, betas, body_pose, global_orient = model_forward(
                params, jnp.asarray(np.stack(crops)))
            scaled_focal = cfg.focal_length / crop_size * max(H, W)
            cam_full = np.asarray(cam_crop_to_full(
                cams, jnp.asarray(centers), jnp.asarray(np.asarray(sizes, np.float32)),
                jnp.asarray(np.tile([[W, H]], (len(crops), 1)), jnp.float32),
                scaled_focal))
            # pose embedding for association: betas + flattened body pose
            embeds = np.concatenate(
                [np.asarray(betas),
                 np.asarray(body_pose).reshape(len(crops), -1)], axis=1)
            payloads = [
                {"verts": np.asarray(verts[i]), "cam_t": cam_full[i],
                 "betas": np.asarray(betas[i])}
                for i in range(len(crops))
            ]
            frame_records = tracker.update(boxes[:, :4], embeds, payloads)
            if smoother is not None and frame_records:
                # smooth pose/betas/cam per track, then ONE batched SMPL
                # forward on device for the smoothed vertices
                go_np = np.asarray(global_orient)
                bp_np = np.asarray(body_pose)
                sm_go, sm_bp, sm_b, ids = [], [], [], []
                for i, r in enumerate(frame_records):
                    g, b, be, ct = smoother.update(
                        r["track_id"], go_np[i], bp_np[i],
                        r["payload"]["betas"], r["payload"]["cam_t"])
                    sm_go.append(g)
                    sm_bp.append(b)
                    sm_b.append(be)
                    r["payload"]["cam_t"] = ct
                    r["payload"]["betas"] = be
                    ids.append(r["track_id"])
                sm_verts = np.asarray(smpl_forward(
                    jnp.asarray(np.stack(sm_go)), jnp.asarray(np.stack(sm_bp)),
                    jnp.asarray(np.stack(sm_b))))
                for i, r in enumerate(frame_records):
                    r["payload"]["verts"] = sm_verts[i]
                smoother.prune(t.track_id for t in tracker.tracks)
        all_records.append([
            {"track_id": r["track_id"], "box": r["box"].tolist()}
            for r in frame_records
        ])

        if args.render:
            composite = img.copy()
            scaled_focal = cfg.focal_length / crop_size * max(H, W)
            for r in frame_records:
                v = r["payload"]["verts"] + r["payload"]["cam_t"]
                composite = overlay_mesh_on_image(
                    composite, v, smpl_model.faces, scaled_focal, alpha=0.8)
                x1, y1, x2, y2 = map(int, r["box"])
                cv2.rectangle(composite, (x1, y1), (x2, y2), (0, 255, 0), 2)
                cv2.putText(composite, f"id{r['track_id']}", (x1, max(y1 - 5, 12)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 0), 2)
            if writer is None:
                writer = cv2.VideoWriter(
                    os.path.join(args.out_folder, "tracked.mp4"),
                    cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
            writer.write(composite[:, :, ::-1])

    cap.release()
    if writer is not None:
        writer.release()
    with open(os.path.join(args.out_folder, "tracks.pkl"), "wb") as f:
        pickle.dump({
            "per_frame": all_records,
            "tracks": {
                t.track_id: [
                    {k: v for k, v in h.items() if k != "verts"}
                    for h in t.history
                ]
                for t in tracker.tracks
            },
        }, f)
    n_tracks = tracker._next_id - 1
    print(f"{frame_idx} frames, {n_tracks} tracks -> {args.out_folder}")


if __name__ == "__main__":
    main()
