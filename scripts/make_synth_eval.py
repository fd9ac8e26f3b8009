"""Generate 3DPW- and EMDB-layout eval datasets from humanoid synthetic renders.

Writes annotation npz + jpgs in the exact layouts `data/npz_dataset.py`
consumes, so the PRODUCTION eval path — host crop pipeline, gendered
GT-vertex computer, Evaluator protocols (pelvis-idx AND EMDB mid-hip/J24),
CSV append — runs end-to-end on data with real ground truth:

  3DPW layout (ref lib/datasets/image_dataset.py npz mode):
    <out>/3DPW/img_*.jpg + <out>/3dpw_test.npz
    keys: imgname, center, scale(px,2), body_pose aa72, betas,
          body/extra_keypoints_{2d,3d}, gender
  EMDB layout (ref lib/datasets/emdb_dataset.py:51-104):
    <out>/EMDB/img_*.jpg + <out>/EMDB/emdb_for_hmr2.npz
    keys: imgname, center, scale (n,1 scalar — the ÷200 reshape path),
          body_pose, has_body_pose, betas, has_betas,
          keypoints_2d (44 concatenated), body/extra_keypoints_3d, gender

  python scripts/make_synth_eval.py --out /tmp/syntheval --n 256
  python -m cli.eval --dataset 3DPW-TEST,EMDB --dataset-dir /tmp/syntheval \
      --params-npz artifacts_synth/flagship_final.npz

(The real 3DPW/EMDB npz files are registration-gated and absent from this
environment; this provides the harness fully-labelled stand-ins drawn from
the same distribution the in-framework model trains on.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def generate_samples(args, layout_dir, img_subdir):
    """Render n samples; return (names, annotation arrays)."""
    import jax
    import cv2

    from tokenhmr_tpu.data.synth_crops import SynthConfig, make_synth_batch_fn
    from tokenhmr_tpu.models.humanoid import humanoid_smpl_model
    from tokenhmr_tpu.ops.rotations import matrix_to_axis_angle

    model = humanoid_smpl_model(num_vertices=6890)
    scfg = SynthConfig(normalize=False)
    gen = jax.jit(make_synth_batch_fn(model, scfg), static_argnums=1)

    img_dir = os.path.join(layout_dir, img_subdir)
    os.makedirs(img_dir, exist_ok=True)

    names, centers, poses = [], [], []
    betas_all, kp2d_all, kp3d_all = [], [], []
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
            poses.append(np.concatenate([go_aa[i], bp_aa[i].reshape(-1)]))
            betas_all.append(np.asarray(batch["smpl_params"]["betas"][i]))
            # kp2d: [-.5,.5] square-frame units -> saved-image pixels
            px = (kp2[i, :, 0] + 0.5) * scfg.image_size - 32.0
            py = (kp2[i, :, 1] + 0.5) * scfg.image_size
            kp2d_all.append(np.stack([px, py, kp2[i, :, 2]], -1))
            kp3d_all.append(kp3[i])
            idx += 1

    return {
        "n": idx,
        "imgname": np.asarray(names),
        "center": np.asarray(centers, np.float32),
        "body_pose": np.asarray(poses, np.float32),
        "betas": np.asarray(betas_all, np.float32),
        "kp2d": np.asarray(kp2d_all, np.float32),
        "kp3d": np.asarray(kp3d_all, np.float32),
    }


def write_3dpw(out, s):
    """3DPW layout: split body/extra keypoints, per-axis pixel scale."""
    n = s["n"]
    np.savez(
        os.path.join(out, "3dpw_test.npz"),
        imgname=s["imgname"],
        center=s["center"],
        scale=np.full((n, 2), 256.0, np.float32),
        body_pose=s["body_pose"],
        has_body_pose=np.ones(n, np.float32),
        betas=s["betas"],
        has_betas=np.ones(n, np.float32),
        body_keypoints_2d=s["kp2d"][:, :25],
        extra_keypoints_2d=s["kp2d"][:, 25:],
        body_keypoints_3d=s["kp3d"][:, :25],
        extra_keypoints_3d=s["kp3d"][:, 25:],
        gender=np.asarray(["m"] * n),
    )


def write_emdb(out, s):
    """EMDB layout (ref emdb_dataset.py:51-104): concatenated keypoints_2d,
    scalar (n,1) scale, mixed genders to exercise the gendered GT path."""
    n = s["n"]
    gender = np.asarray(["m" if i % 2 == 0 else "f" for i in range(n)])
    np.savez(
        os.path.join(out, "emdb_for_hmr2.npz"),
        imgname=s["imgname"],
        center=s["center"],
        scale=np.full((n, 1), 256.0, np.float32),
        body_pose=s["body_pose"],
        has_body_pose=np.ones(n, np.float32),
        betas=s["betas"],
        has_betas=np.ones(n, np.float32),
        keypoints_2d=s["kp2d"],                     # 44 concatenated
        body_keypoints_3d=s["kp3d"][:, :25],
        extra_keypoints_3d=s["kp3d"][:, 25:],
        gender=gender,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=88_000_000,
                   help="disjoint from the training seed range")
    p.add_argument("--layout", default="both", choices=["3dpw", "emdb", "both"])
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.layout in ("3dpw", "both"):
        s = generate_samples(args, args.out, "3DPW")
        write_3dpw(args.out, s)
        print(f"wrote {s['n']} 3DPW-layout samples to {args.out}")
    if args.layout in ("emdb", "both"):
        # disjoint seed per layout so the two eval sets differ
        emdb_args = argparse.Namespace(**vars(args))
        emdb_args.seed = args.seed + 10_000
        s = generate_samples(emdb_args, args.out, "EMDB")
        write_emdb(os.path.join(args.out, "EMDB"), s)
        print(f"wrote {s['n']} EMDB-layout samples to {args.out}")


if __name__ == "__main__":
    main()
