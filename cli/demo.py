"""Single-image / folder multi-person demo.

Capabilities of ref `tokenhmr/demo.py`: detect people -> 256x192-aspect
crops -> batched TokenHMR forward -> full-image camera -> mesh overlay
renders (+ optional side view, .obj export).  The detector is pluggable
(tokenhmr_tpu/data/detect.py) instead of hard-wired detectron2.

Usage:
  python -m cli.demo --img-folder demo/images --out-folder demo/out \
      --checkpoint ckpt --tokenizer-checkpoint tokenizer.pth \
      --smpl-model smpl.pkl [--detector hog|full_frame|file]
Smoke:
  python -m cli.demo --img-folder imgs --out-folder out --tiny --platform cpu
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img-folder", required=True)
    p.add_argument("--out-folder", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--params-npz", default=None,
                   help="in-framework trained export (cli/train.py "
                        "--export-params flat npz) — alternative to the "
                        "torch --checkpoint")
    p.add_argument("--tokenizer-checkpoint", default=None)
    p.add_argument("--smpl-model", default=None)
    p.add_argument("--joint-regressor-extra", default=None)
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
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--side-view", action="store_true")
    p.add_argument("--save-mesh", action="store_true")
    p.add_argument("--device-preproc", action="store_true",
                   help="fused full-frame pipeline: crops are warped ON "
                        "DEVICE inside the model jit (serve.FullFramePipeline)")
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="W8A8 int8 inference for the ViT dense layers "
                        "(~1.5x on TPU v5e; dynamic per-token scales — see "
                        "docs/PERF_NOTES.md)")
    p.add_argument("--merge", default=None, metavar="SCHED",
                   help="ToMe token merging, e.g. '8:32,16:32,24:32' = merge"
                        " 32 tokens before ViT blocks 8/16/24 (speed-vs-"
                        "accuracy knob; see ops/merge.py)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import cv2

    from tokenhmr_tpu.data.augment import DEFAULT_MEAN, DEFAULT_STD, generate_image_patch
    from tokenhmr_tpu.data.detect import FileBoxSource, make_detector
    from tokenhmr_tpu.data.npz_dataset import load_image_rgb
    from tokenhmr_tpu.models import smpl as S
    from tokenhmr_tpu.models.tokenhmr import forward_step
    from tokenhmr_tpu.ops.crop import bbox_xyxy_to_center_scale, expand_to_aspect_ratio
    from tokenhmr_tpu.ops.projection import cam_crop_to_full
    from tokenhmr_tpu.utils.render import overlay_mesh_on_image, save_obj

    # model
    mean_params = None
    if args.params_npz:
        # in-framework trained export (cli/train.py --export-params)
        import __graft_entry__ as G
        from tokenhmr_tpu.train.checkpoint import load_params_npz

        cfg, frozen, smpl_model, params, _ = G._flagship(
            batch_size=1, tiny=args.tiny)
        trees, _ = load_params_npz(args.params_npz)
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        params = as_jnp(trees["params"])
        frozen = {"params": as_jnp(trees["frozen_params"]),
                  "vq_state": frozen["vq_state"]._replace(
                      codebook=jnp.asarray(trees["codebook"]["codebook"]))}
        print(f"loaded trained params from {args.params_npz}")
    elif args.tiny or args.checkpoint is None:
        import __graft_entry__ as G

        cfg, frozen, smpl_model, params, _ = G._flagship(batch_size=1, tiny=args.tiny)
    else:
        from tokenhmr_tpu.convert.load import load_tokenhmr_checkpoint

        cfg, params, frozen, mean_params = load_tokenhmr_checkpoint(
            args.checkpoint, tokenizer_path=args.tokenizer_checkpoint
        )
        smpl_model = S.load_smpl_model(
            args.smpl_model, joint_regressor_extra=args.joint_regressor_extra
        )

    if args.quant:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, quant=args.quant))
    if args.merge:
        import dataclasses

        sched = tuple(tuple(int(v) for v in part.split(":"))
                      for part in args.merge.split(","))
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, merge_schedule=sched))

    patch_h, patch_w = cfg.vit.img_size
    crop_size = max(cfg.vit.img_size)

    @jax.jit
    def model_forward(params, img):
        return forward_step(params, frozen, cfg, smpl_model, img,
                            mean_params=mean_params)

    def ensure_calibrated(crops_f32):
        """One-shot int8 calibration on the FIRST real crops (static
        per-channel scales + pre-quantized weights -> fused TPU kernels).
        Random-noise calibration would underestimate real activation
        ranges and clip the static path."""
        nonlocal params
        if args.quant != "int8" or "backbone_quant" in params:
            return
        import dataclasses

        from tokenhmr_tpu.models.vit import ViT
        ccfg = dataclasses.replace(cfg.vit, quant="calib")
        quant_col = jax.jit(lambda p, im: ViT(ccfg).apply(
            {"params": p["backbone"]}, im, mutable=["quant"])[1]["quant"]
        )(params, jnp.asarray(crops_f32))
        params = dict(params)
        params["backbone_quant"] = quant_col
        if pipeline is not None:
            pipeline.params = params

    pipeline = None
    if args.device_preproc:
        from tokenhmr_tpu.serve import FullFramePipeline

        pipeline = FullFramePipeline(params, frozen, cfg, smpl_model)

    detector = make_detector(args.detector, args.boxes_file,
                             ckpt=args.detector_ckpt,
                             tiles=args.detector_tiles,
                             score_thresh=args.detector_thresh)
    os.makedirs(args.out_folder, exist_ok=True)

    exts = ("*.jpg", "*.jpeg", "*.png")
    images = sorted(sum([glob.glob(os.path.join(args.img_folder, e)) for e in exts], []))
    if not images:
        print(f"no images found in {args.img_folder}")
        return

    for img_path in images:
        img = load_image_rgb(img_path)
        H, W = img.shape[:2]
        det = detector.for_image(img_path) if isinstance(detector, FileBoxSource) else detector
        boxes = det(img)
        if len(boxes) == 0:
            print(f"{os.path.basename(img_path)}: no people")
            continue
        if pipeline is not None:
            from tokenhmr_tpu.ops.projection import weak_perspective_to_translation

            if args.quant == "int8" and "backbone_quant" not in params:
                # host-warp this frame's crops once, just for calibration
                cc, ss = bbox_xyxy_to_center_scale(boxes[:, :4])
                cal = []
                for c, s in zip(cc, ss):
                    wh = expand_to_aspect_ratio(s * 200.0, (192, 256))
                    size = float(wh.max())
                    patch, _ = generate_image_patch(
                        img, c[0], c[1], size, size, crop_size, crop_size,
                        do_flip=False, scale=1.0, rot=0.0)
                    cal.append((patch.astype(np.float32) - DEFAULT_MEAN)
                               / DEFAULT_STD)
                ensure_calibrated(np.stack(cal))
            out = pipeline(img, boxes[:, :4])
            verts = out["pred_vertices"]
            cam_t = out["pred_cam_t_full"]
            focal = np.full((len(verts), 2), cfg.focal_length, np.float32)
            cam_t_crop = np.asarray(weak_perspective_to_translation(
                jnp.asarray(out["pred_cam"]), jnp.asarray(focal),
                cfg.image_size))
            # host-side re-warp of the person crops, for the per-person
            # visualization panels only (the model path warped on device)
            centers, scales = bbox_xyxy_to_center_scale(boxes[:, :4])
            patches = []
            for c, s in zip(centers, scales):
                wh = expand_to_aspect_ratio(s * 200.0, (192, 256))
                size = float(wh.max())
                patch, _ = generate_image_patch(
                    img, c[0], c[1], size, size, crop_size, crop_size,
                    do_flip=False, scale=1.0, rot=0.0)
                patches.append(patch.astype(np.uint8))
            _render_outputs(args, img, img_path, verts, cam_t, cam_t_crop,
                            patches, smpl_model, cfg, crop_size)
            continue
        centers, scales = bbox_xyxy_to_center_scale(boxes[:, :4])

        crops, box_sizes, patches = [], [], []
        for c, s in zip(centers, scales):
            wh = expand_to_aspect_ratio(s * 200.0, (192, 256))
            size = float(wh.max())
            # anti-alias blur for heavy downscaling
            # (ref vitdet_dataset.py:58-65: sigma=(size/patch/2 - 1)/2)
            src_img = img
            factor = (size / crop_size) / 2.0
            if factor > 1.1:
                sigma = (factor - 1) / 2
                src_img = cv2.GaussianBlur(img, (0, 0), sigmaX=sigma,
                                           sigmaY=sigma)
            patch, _ = generate_image_patch(
                src_img, c[0], c[1], size, size, crop_size, crop_size,
                do_flip=False, scale=1.0, rot=0.0,
            )
            patches.append(patch.astype(np.uint8))
            crops.append((patch.astype(np.float32) - DEFAULT_MEAN) / DEFAULT_STD)
            box_sizes.append(size)
        crops_np = np.stack(crops)
        box_sizes = np.asarray(box_sizes, np.float32)

        # full-image focal: FOCAL/IMAGE_SIZE * max(H, W) — the same scaled
        # value must drive BOTH cam_crop_to_full and the renderer
        # (ref demo.py:84-85)
        scaled_focal = cfg.focal_length / crop_size * max(H, W)
        ensure_calibrated(crops_np[:args.batch_size])
        all_verts, all_cam_t, all_cam_t_crop = [], [], []
        for s0 in range(0, len(crops_np), args.batch_size):
            out = model_forward(params, jnp.asarray(crops_np[s0:s0 + args.batch_size]))
            cam_full = cam_crop_to_full(
                out["pred_cam"],
                jnp.asarray(centers[s0:s0 + args.batch_size]),
                jnp.asarray(box_sizes[s0:s0 + args.batch_size]),
                jnp.asarray(np.tile([[W, H]], (len(out["pred_cam"]), 1)), jnp.float32),
                focal_length=scaled_focal,
            )
            all_verts.append(np.asarray(out["pred_vertices"]))
            all_cam_t.append(np.asarray(cam_full))
            all_cam_t_crop.append(np.asarray(out["pred_cam_t"]))
        verts = np.concatenate(all_verts)
        cam_t = np.concatenate(all_cam_t)
        cam_t_crop = np.concatenate(all_cam_t_crop)
        _render_outputs(args, img, img_path, verts, cam_t, cam_t_crop,
                        patches, smpl_model, cfg, crop_size)


def _render_outputs(args, img, img_path, verts, cam_t, cam_t_crop, patches,
                    smpl_model, cfg, crop_size):
    """Write the reference demo's output files (ref demo.py:97-145):
    {base}_{person}.png crop panels (input | render [| side view]),
    {base}_{person}.obj meshes with --save-mesh, and the {base}_all.png
    full-frame composite."""
    import cv2

    from tokenhmr_tpu.utils.render import overlay_mesh_on_image, save_obj

    H, W = img.shape[:2]
    scaled_focal = cfg.focal_length / crop_size * max(H, W)
    base = os.path.splitext(os.path.basename(img_path))[0]
    rot90 = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    composite = img.copy()
    for pi in range(len(verts)):
        v_cam = verts[pi] + cam_t[pi]
        composite = overlay_mesh_on_image(
            composite, v_cam, smpl_model.faces, scaled_focal, alpha=0.9
        )
        # per-person panel on the model crop (ref demo.py:105-115)
        patch = patches[pi]
        panel = [patch]
        crop_render = overlay_mesh_on_image(
            patch, verts[pi] + cam_t_crop[pi], smpl_model.faces,
            cfg.focal_length, alpha=0.9)
        panel.append(crop_render)
        if args.side_view:
            white = np.full_like(patch, 255)
            panel.append(overlay_mesh_on_image(
                white, (verts[pi] @ rot90.T) + cam_t_crop[pi],
                smpl_model.faces, cfg.focal_length, alpha=1.0))
        cv2.imwrite(os.path.join(args.out_folder, f"{base}_{pi}.png"),
                    np.concatenate(panel, axis=1)[:, :, ::-1])
        if args.save_mesh:
            save_obj(os.path.join(args.out_folder, f"{base}_{pi}.obj"),
                     verts[pi] + cam_t[pi], smpl_model.faces)
    cv2.imwrite(os.path.join(args.out_folder, f"{base}_all.png"),
                composite[:, :, ::-1])
    print(f"{os.path.basename(img_path)}: {len(verts)} people -> "
          f"{base}_all.png")


if __name__ == "__main__":
    main()
