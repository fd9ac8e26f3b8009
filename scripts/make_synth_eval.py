"""Generate a 3DPW-layout eval dataset from humanoid synthetic renders.

Writes  <out>/3DPW/img_*.jpg  +  <out>/3dpw_test.npz  in the exact
annotation layout `data/npz_dataset.py` consumes (imgname, center,
scale-px, body_pose aa72, betas, body/extra keypoints 2d px / 3d), so the
PRODUCTION eval path — host crop pipeline, gendered GT-vertex computer,
Evaluator protocols, CSV append — runs end-to-end on data with real
ground truth:

  python scripts/make_synth_eval.py --out /tmp/synth3dpw --n 256
  python -m cli.eval --dataset 3DPW-TEST --dataset-dir /tmp/synth3dpw \
      --params-npz artifacts_synth/flagship_final.npz

(The real 3DPW npz files are registration-gated and absent from this
environment; this provides the harness a fully-labelled stand-in drawn
from the same distribution the in-framework model trains on.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=88_000_000,
                   help="disjoint from the training seed range")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import cv2
    import jax.numpy as jnp

    from tokenhmr_tpu.data.synth_crops import SynthConfig, make_synth_batch_fn
    from tokenhmr_tpu.models.humanoid import humanoid_smpl_model
    from tokenhmr_tpu.ops.rotations import matrix_to_axis_angle

    model = humanoid_smpl_model(num_vertices=6890)
    scfg = SynthConfig(normalize=False)
    gen = jax.jit(make_synth_batch_fn(model, scfg), static_argnums=1)

    img_dir = os.path.join(args.out, "3DPW")
    os.makedirs(img_dir, exist_ok=True)

    names, centers, scales = [], [], []
    poses, betas_all, kp2d_all, kp3d_all = [], [], [], []
    idx = 0
    for b in range(args.n // args.batch):
        batch = gen(jax.random.PRNGKey(args.seed + b), args.batch)
        imgs = np.asarray(batch["img"])
        go_aa = np.asarray(matrix_to_axis_angle(
            batch["smpl_params"]["global_orient"][:, 0]))
        bp_aa = np.asarray(matrix_to_axis_angle(
            batch["smpl_params"]["body_pose"]))
        kp2 = np.asarray(batch["keypoints_2d"])       # (B, 44, 3), [-.5,.5]
        kp3 = np.asarray(batch["keypoints_3d"])       # (B, 44, 4)
        for i in range(args.batch):
            name = f"img_{idx:05d}.jpg"
            cv2.imwrite(os.path.join(img_dir, name),
                        (imgs[i, :, :, ::-1] * 255).astype(np.uint8))
            names.append(name)
            # the saved image IS the (256, 192) crop cut from the 256
            # square camera frame: center mid-image, person box = full
            centers.append([96.0, 128.0])
            scales.append([256.0, 256.0])
            poses.append(np.concatenate([go_aa[i], bp_aa[i].reshape(-1)]))
            betas_all.append(np.asarray(batch["smpl_params"]["betas"][i]))
            # kp2d: [-.5,.5] square-frame units -> saved-image pixels
            px = (kp2[i, :, 0] + 0.5) * scfg.image_size - 32.0
            py = (kp2[i, :, 1] + 0.5) * scfg.image_size
            kp2d_all.append(np.stack([px, py, kp2[i, :, 2]], -1))
            kp3d_all.append(kp3[i])
            idx += 1

    kp2d = np.asarray(kp2d_all, np.float32)
    kp3d = np.asarray(kp3d_all, np.float32)
    np.savez(
        os.path.join(args.out, "3dpw_test.npz"),
        imgname=np.asarray(names),
        center=np.asarray(centers, np.float32),
        scale=np.asarray(scales, np.float32),
        body_pose=np.asarray(poses, np.float32),
        has_body_pose=np.ones(idx, np.float32),
        betas=np.asarray(betas_all, np.float32),
        has_betas=np.ones(idx, np.float32),
        body_keypoints_2d=kp2d[:, :25],
        extra_keypoints_2d=kp2d[:, 25:],
        body_keypoints_3d=kp3d[:, :25],
        extra_keypoints_3d=kp3d[:, 25:],
        gender=np.asarray(["m"] * idx),
    )
    print(f"wrote {idx} samples to {args.out}")


if __name__ == "__main__":
    main()
