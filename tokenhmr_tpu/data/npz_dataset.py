"""Map-style npz datasets for evaluation and npz-based training.

Capabilities of ref `tokenhmr/lib/datasets/image_dataset.py:50-270` (npz
mode) and `emdb_dataset.py`: annotation loading with graceful fallbacks,
center/scale "/200" convention, BBOX_SHAPE aspect expansion, the crop
pipeline, gendered ground-truth meshes.

TPU-native redesign of the hot spot: the reference runs a PER-ITEM gendered
smplx forward inside __getitem__ on the CPU dataloader workers
(`emdb_dataset.py:184-199` — SURVEY.md flags this as a 2k-crops/sec
starver).  Here items carry only (pose, betas, gender); `GTVertexComputer`
runs ONE batched, jitted, gender-masked SMPL forward per batch on device.
"""
from __future__ import annotations

import dataclasses
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.smpl import SMPLModel, smpl_forward
from ..ops.crop import expand_to_aspect_ratio
from ..ops.rotations import axis_angle_to_matrix
from .augment import AugmConfig, DEFAULT_MEAN, DEFAULT_STD, get_example

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def load_image_rgb(path: str) -> np.ndarray:
    """imread semantics of the reference (BGR->RGB, EXIF ignored)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    if img is None:
        raise IOError(f"Fail to read {path}")
    return img[:, :, ::-1]


@dataclasses.dataclass
class NpzDatasetConfig:
    dataset_file: str
    img_dir: str
    dataset_name: str = ""
    train: bool = False
    img_size: int = 256
    bbox_shape: Optional[Sequence[int]] = (192, 256)
    mean: np.ndarray = dataclasses.field(default_factory=lambda: DEFAULT_MEAN)
    std: np.ndarray = dataclasses.field(default_factory=lambda: DEFAULT_STD)
    augm: AugmConfig = dataclasses.field(default_factory=AugmConfig)
    num_body_joints: int = 23


class NpzDataset:
    """Annotation-npz dataset (3DPW/EMDB/H36M/COCO-style)."""

    def __init__(self, cfg: NpzDatasetConfig, seed: int = 0):
        self.cfg = cfg
        data = np.load(cfg.dataset_file, allow_pickle=True)
        n = len(data["imgname"])
        self.imgname = data["imgname"]
        self.center = data["center"].astype(np.float32)
        scale = data["scale"].reshape(n, -1).astype(np.float32) / 200.0
        self.scale = np.tile(scale, (1, 2)) if scale.shape[1] == 1 else scale

        num_pose = 3 * (cfg.num_body_joints + 1)
        self.body_pose = self._get(data, "body_pose", (n, num_pose))
        self.has_body_pose = self._get(data, "has_body_pose", (n,))
        self.betas = self._get(data, "betas", (n, 10))
        self.has_betas = self._get(data, "has_betas", (n,))

        body_kp2d = self._get(data, "body_keypoints_2d", (n, 25, 3),
                              alt_key="keypoints_2d")
        if body_kp2d.shape[1] == 44:     # EMDB stores the concatenated set
            self.keypoints_2d = body_kp2d
        else:
            extra_kp2d = self._get(data, "extra_keypoints_2d", (n, 19, 3))
            self.keypoints_2d = np.concatenate([body_kp2d, extra_kp2d], axis=1)

        body_kp3d = self._get(data, "body_keypoints_3d", (n, 25, 4))
        extra_kp3d = self._get(data, "extra_keypoints_3d", (n, 19, 4))
        # ref image_dataset.py:141: zero conf of limb body kp3d
        body_kp3d[:, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14], -1] = 0
        self.keypoints_3d = np.concatenate([body_kp3d, extra_kp3d], axis=1).astype(np.float32)

        if "gender" in data:
            self.gender = np.array(
                [0 if str(g) in ("m", "male") else 1 for g in data["gender"]],
                np.int32,
            )
            self.has_gender = True
        else:
            self.gender = -np.ones(n, np.int32)
            self.has_gender = False
        self._rng = np.random.default_rng(seed)

    @staticmethod
    def _get(data, key, shape, alt_key=None):
        if key in data:
            return np.asarray(data[key], np.float32)
        if alt_key is not None and alt_key in data:
            arr = np.asarray(data[alt_key], np.float32)
            return arr
        return np.zeros(shape, np.float32)

    def __len__(self) -> int:
        return len(self.scale)

    def __getitem__(self, idx: int) -> Dict:
        cfg = self.cfg
        name = self.imgname[idx]
        name = name.decode("utf-8") if isinstance(name, bytes) else str(name)
        path = os.path.join(cfg.img_dir, name)
        img = load_image_rgb(path)

        cx, cy = self.center[idx]
        scale = self.scale[idx]
        bbox_size = expand_to_aspect_ratio(
            scale * 200.0, target_aspect_ratio=cfg.bbox_shape
        ).max()

        body_pose = self.body_pose[idx].copy()
        smpl_params = {
            "global_orient": body_pose[:3],
            "body_pose": body_pose[3:],
            "betas": self.betas[idx].copy(),
        }
        has_smpl = {
            "global_orient": self.has_body_pose[idx].copy(),
            "body_pose": self.has_body_pose[idx].copy(),
            "betas": self.has_betas[idx].copy(),
        }

        patch, kp2d, kp3d, smpl_params, has_smpl, img_size = get_example(
            img, cx, cy, bbox_size, bbox_size,
            self.keypoints_2d[idx].copy(), self.keypoints_3d[idx].copy(),
            smpl_params, has_smpl,
            patch_width=cfg.img_size, patch_height=cfg.img_size,
            mean=cfg.mean, std=cfg.std,
            do_augment=cfg.train, augm_config=cfg.augm, rng=self._rng,
        )
        return {
            "img": patch,
            "keypoints_2d": kp2d,
            "keypoints_3d": kp3d,
            "smpl_params": smpl_params,
            "has_smpl_params": has_smpl,
            "box_center": self.center[idx].copy(),
            "box_size": np.float32(bbox_size),
            "img_size": img_size[::-1].astype(np.float32),
            "imgname": path,
            "gender": self.gender[idx],
            "idx": idx,
            "dataset": cfg.dataset_name,
        }


def collate(items: List[Dict]) -> Dict:
    """Stack a list of item dicts into array batches (strings -> lists)."""
    out: Dict = {}
    for k in items[0]:
        v0 = items[0][k]
        if isinstance(v0, dict):
            out[k] = collate([it[k] for it in items])
        elif isinstance(v0, (str, bytes)):
            out[k] = [it[k] for it in items]
        else:
            out[k] = np.stack([np.asarray(it[k]) for it in items])
    return out


class DataLoader:
    """Thread-pooled map-style loader (image decode + warp parallelized).

    Replaces torch DataLoader workers: threads are enough because cv2
    releases the GIL in imdecode/warpAffine.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, drop_last: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        with ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(order), self.batch_size):
                idxs = order[start : start + self.batch_size]
                if self.drop_last and len(idxs) < self.batch_size:
                    break
                items = list(pool.map(self.dataset.__getitem__, idxs))
                yield collate(items)


class GTVertexComputer:
    """Batched gendered ground-truth meshes on device.

    Replaces the per-item smplx forwards of ref `image_dataset.py:254-270` /
    `emdb_dataset.py:184-199` with one jitted call computing both gendered
    meshes and selecting by mask (cheaper than host round trips; the second
    forward is ~free next to the rest of the eval step).
    """

    def __init__(self, male: SMPLModel, female: SMPLModel,
                 neutral: Optional[SMPLModel] = None):
        self.male = male
        self.female = female
        self.neutral = neutral or male
        self._fn = jax.jit(self._compute)

    def _compute(self, global_orient_aa, body_pose_aa, betas, gender):
        B = betas.shape[0]
        go = axis_angle_to_matrix(global_orient_aa.reshape(B, 1, 3))
        bp = axis_angle_to_matrix(body_pose_aa.reshape(B, -1, 3))
        out_m = smpl_forward(self.male, betas, go, bp)
        out_f = smpl_forward(self.female, betas, go, bp)
        out_n = smpl_forward(self.neutral, betas, go, bp)
        is_f = (gender == 1)[:, None, None]
        is_n = (gender < 0)[:, None, None]   # genderless npz -> neutral model
        verts = jnp.where(is_n, out_n["vertices"],
                          jnp.where(is_f, out_f["vertices"], out_m["vertices"]))
        joints = jnp.where(is_n, out_n["joints"],
                           jnp.where(is_f, out_f["joints"], out_m["joints"]))
        return verts, joints

    def __call__(self, batch: Dict) -> Dict:
        sp = batch["smpl_params"]
        verts, joints = self._fn(
            jnp.asarray(sp["global_orient"]), jnp.asarray(sp["body_pose"]),
            jnp.asarray(sp["betas"]), jnp.asarray(batch["gender"]),
        )
        batch = dict(batch)
        batch["vertices"] = verts
        return batch
