"""Tar-shard streaming training datasets (webdataset-format, no webdataset
dependency).

Capabilities of ref `image_dataset.py:275-533` (load_tars_as_webdataset +
process_webdataset_tar_item) and `datasets/__init__.py:28-42`
(MixedWebDataset): brace-expanded shard urls, per-host shard splitting,
shard+sample shuffling with a buffer, per-person expansion with detection
masks, the filter/suppress stack, crop/augment into training items, weighted
dataset mixing, epoch sizing, and a background-thread prefetcher.

Tar item layout (webdataset convention, same files the reference reads):
  <key>.jpg                 uint8 image
  <key>.data.pyd            pickled list of per-person annotation dicts
  <key>.detection.npz       optional {'masks': (P, H, W) bool}
"""
from __future__ import annotations

import dataclasses
import io
import pickle
import queue
import re
import tarfile
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .augment import AugmConfig, DEFAULT_MEAN, DEFAULT_STD, get_example
from . import filters as F


def expand_urls(pattern: str) -> List[str]:
    """Brace-range expansion: 'a-{000000..000004}.tar' -> 5 urls
    (ref image_dataset.py:21-28 via braceexpand)."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if not m:
        return [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    out = []
    for i in range(int(lo), int(hi) + 1):
        out.extend(expand_urls(pattern[: m.start()] + str(i).zfill(width)
                               + pattern[m.end():]))
    return out


def iter_tar_samples(path: str, decode_images: bool = True
                     ) -> Iterator[Dict[str, Any]]:
    """Group tar members by key and decode (ref wds .decode('rgb8')).

    decode_images=False keeps the raw jpg bytes ('jpg_bytes') so the
    expensive imdecode can run in the parallel loader's worker pool."""
    with tarfile.open(path, "r|*") as tf:
        current_key = None
        sample: Dict[str, Any] = {}
        for member in tf:
            if not member.isfile():
                continue
            name = member.name
            key, _, ext = name.partition(".")
            if current_key is not None and key != current_key:
                if sample:
                    yield sample
                sample = {}
            current_key = key
            raw = tf.extractfile(member).read()
            if ext in ("jpg", "jpeg", "png"):
                if decode_images:
                    img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                       cv2.IMREAD_COLOR)
                    sample["jpg"] = img[:, :, ::-1]  # rgb8
                else:
                    sample["jpg_bytes"] = raw
                sample["__key__"] = key
            elif ext == "data.pyd":
                sample["data.pyd"] = pickle.loads(raw)
                sample["__key__"] = key
            elif ext == "detection.npz":
                sample["detection.npz"] = dict(np.load(io.BytesIO(raw),
                                                       allow_pickle=True))
                sample["__key__"] = key
        if sample:
            yield sample


@dataclasses.dataclass
class TarDatasetConfig:
    urls: str = ""
    dataset_name: str = ""
    train: bool = True
    img_size: int = 256
    bbox_shape: Optional[Sequence[int]] = (192, 256)
    augm: AugmConfig = dataclasses.field(default_factory=AugmConfig)
    # filter stack flags (ref datasets_tar.yaml / data_filtering/low1.yaml)
    suppress_kp_conf_thresh: float = 0.3
    suppress_betas_thresh: float = 3.0
    suppress_bad_poses: bool = True
    poses_betas_simultaneous: bool = True
    betas_reg: bool = True
    filter_no_poses: bool = False
    filter_numkp: int = 4
    filter_numkp_thresh: float = 0.0
    filter_reproj_thresh: float = 31622.0   # 10**4.5
    filter_min_bbox_size: float = 0.0
    use_smpl_params: bool = True
    shuffle_buffer: int = 100
    corrupt_keys: Sequence[str] = ()
    amass_hist_path: Optional[str] = None


class TarPoseDataset:
    """One dataset's infinite (resampled) per-person item stream."""

    def __init__(self, cfg: TarDatasetConfig, process_index: int = 0,
                 process_count: int = 1, seed: int = 0):
        self.cfg = cfg
        urls = expand_urls(cfg.urls)
        # per-host shard split (ref wds.split_by_node)
        self.urls = urls[process_index::process_count] or urls
        self.rng = np.random.default_rng(seed + process_index)
        self.hist = (F.load_amass_hist_smooth(cfg.amass_hist_path)
                     if (cfg.suppress_bad_poses and cfg.amass_hist_path)
                     else None)

    # --- per-person expansion (ref split_data :293-307) -------------------
    def _split(self, sample: Dict) -> Iterator[Dict]:
        datas = sample.get("data.pyd", [])
        if isinstance(datas, dict):
            datas = [datas]
        img = sample.get("jpg")
        for data in datas:
            if "detection.npz" in sample and "extra_info" in data and \
                    "detection_npz_idx" in data.get("extra_info", {}):
                det_idx = data["extra_info"]["detection_npz_idx"]
                mask = sample["detection.npz"]["masks"][det_idx]
            elif img is not None:
                mask = np.ones(img.shape[:2], bool)
            else:
                mask = None  # filled by _decode once the image exists
            yield {"__key__": sample["__key__"], "jpg": img,
                   "jpg_bytes": sample.get("jpg_bytes"),
                   "data": dict(data), "mask": mask}

    def _decode(self, person: Dict) -> Dict:
        """Decode deferred jpg bytes (runs in the loader's worker pool).

        Uses the native libjpeg decoder (native/jpegdec.cpp — GIL-free,
        thread-pool capable) when available; cv2 handles png/fallback."""
        if person.get("jpg") is None:
            raw = person["jpg_bytes"]
            img = None
            try:
                from ..native import jpeg_decode

                img = jpeg_decode(raw)  # already RGB
            except Exception:
                img = None
            if img is None:
                img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                   cv2.IMREAD_COLOR)[:, :, ::-1]
            person["jpg"] = img
        person.pop("jpg_bytes", None)
        if person.get("mask") is None:
            person["mask"] = np.ones(person["jpg"].shape[:2], bool)
        return person

    # --- filter/suppress stack (ref :391-424) -----------------------------
    def _apply_filters(self, person: Dict) -> Optional[Dict]:
        c = self.cfg
        d = person["data"]
        if c.suppress_kp_conf_thresh > 0:
            d = F.suppress_bad_kps(d, c.suppress_kp_conf_thresh)
        if c.suppress_betas_thresh > 0:
            d = F.suppress_bad_betas(d, c.suppress_betas_thresh)
        if c.suppress_bad_poses and self.hist is not None:
            d = F.suppress_bad_poses(d, self.hist)
        if c.poses_betas_simultaneous:
            d = F.poses_betas_simultaneous(d)
        if c.filter_no_poses and not F.filter_no_poses(d):
            return None
        if c.filter_numkp > 0 and not F.filter_numkp(
                d, c.filter_numkp, c.filter_numkp_thresh):
            return None
        if c.filter_reproj_thresh > 0 and not F.filter_reproj_error(
                d, c.filter_reproj_thresh):
            return None
        if c.filter_min_bbox_size > 0 and not F.filter_bbox_size(
                d, c.filter_min_bbox_size):
            return None
        if c.betas_reg:
            d = F.set_betas_for_reg(d)
        if not c.use_smpl_params:
            d["has_body_pose"] = np.array(0.0, np.float32)
            d["has_betas"] = np.array(0.0, np.float32)
        person["data"] = d
        return person

    # --- crop/augment into a training item (ref :443-533) -----------------
    def _process(self, person: Dict, rng=None) -> Dict:
        """rng: per-worker numpy Generator override — self.rng is NOT
        thread-safe, so the parallel loader passes its own (data/loader.py)."""
        c = self.cfg
        rng = rng if rng is not None else self.rng
        data = person["data"]
        image = person["jpg"]
        mask = person["mask"]
        from ..ops.crop import expand_to_aspect_ratio

        center = np.asarray(data["center"], np.float32)
        scale = np.asarray(data["scale"], np.float32)
        bbox_size = expand_to_aspect_ratio(
            scale * 200.0, target_aspect_ratio=c.bbox_shape
        ).max()
        body_pose = np.asarray(data["body_pose"], np.float32)
        smpl_params = {
            "global_orient": body_pose[:3],
            "body_pose": body_pose[3:],
            "betas": np.asarray(data["betas"], np.float32),
        }
        has_smpl = {
            "global_orient": np.float32(data["has_body_pose"]),
            "body_pose": np.float32(data["has_body_pose"]),
            "betas": np.float32(data["has_betas"]),
        }
        rgba = np.concatenate(
            [image, (mask.astype(np.uint8) * 255)[:, :, None]], axis=2
        )
        mean4 = np.concatenate([DEFAULT_MEAN, [0.0]]).astype(np.float32)
        std4 = np.concatenate([DEFAULT_STD, [255.0]]).astype(np.float32)
        patch, kp2d, kp3d, smpl_params, has_smpl, img_size = get_example(
            rgba, center[0], center[1], bbox_size, bbox_size,
            np.asarray(data["keypoints_2d"], np.float32),
            np.asarray(data["keypoints_3d"], np.float32),
            smpl_params, has_smpl,
            patch_width=c.img_size, patch_height=c.img_size,
            mean=mean4, std=std4,
            do_augment=c.train, augm_config=c.augm, rng=rng,
        )
        img_patch = patch[:, :, :3]
        mask_patch = np.clip(patch[:, :, 3], 0, 1)
        if (mask_patch < 0.5).all():
            mask_patch = np.ones_like(mask_patch)
        return {
            "img": img_patch.astype(np.float32),
            "mask": mask_patch.astype(np.float32),
            "keypoints_2d": kp2d,
            "keypoints_3d": kp3d,
            "smpl_params": smpl_params,
            "has_smpl_params": has_smpl,
            "box_center": center,
            "box_size": np.float32(bbox_size),
            "img_size": img_size[::-1].astype(np.float32),
            "imgname": person["__key__"],
            "dataset": c.dataset_name,
        }

    def iter_raw(self) -> Iterator[Dict]:
        """Raw per-person stream: tar read + split + corrupt skip + shuffle
        buffer, WITHOUT the filter/augment work — that runs in the parallel
        loader's worker pool (data/loader.py).  Each yielded person carries
        no shared mutable state, so filters+process are thread-safe."""
        c = self.cfg
        buf: List[Dict] = []
        while True:  # resampled infinite stream (ref resampled=True)
            urls = list(self.urls)
            self.rng.shuffle(urls)
            for url in urls:
                try:
                    samples = iter_tar_samples(url, decode_images=False)
                    for sample in samples:
                        if sample.get("__key__") in c.corrupt_keys:
                            continue
                        if ("jpg" not in sample and "jpg_bytes" not in sample) \
                                or "data.pyd" not in sample:
                            continue
                        for person in self._split(sample):
                            if c.shuffle_buffer > 1 and c.train:
                                buf.append(person)
                                if len(buf) >= c.shuffle_buffer:
                                    idx = self.rng.integers(len(buf))
                                    buf[idx], buf[-1] = buf[-1], buf[idx]
                                    yield buf.pop()
                            else:
                                yield person
                except (tarfile.TarError, EOFError, OSError) as e:
                    # corrupt-shard skip (ref CORRUPT_TARS handling)
                    print(f"[tar_dataset] skipping shard {url}: {e}")
                    continue
            if not c.train:
                for item in buf:
                    yield item
                return

    def __iter__(self) -> Iterator[Dict]:
        for person in self.iter_raw():
            person = self._apply_filters(self._decode(person))
            if person is None:
                continue
            yield self._process(person)


class BedlamTarDataset(TarPoseDataset):
    """BEDLAM tar variant (ref `bedlam_dataset_tar.py`): closeup 90-degree
    rotation, real camera intrinsics, GT 3D keypoints from an SMPL forward
    and GT 2D keypoints by intrinsic projection — derived BEFORE cropping.

    If the annotation dict already carries 'gtkps3d' (a precompute pass),
    the SMPL forward is skipped; else it runs host-side in numpy.
    """

    def __init__(self, cfg: TarDatasetConfig, smpl_model, **kw):
        super().__init__(cfg, **kw)
        self.smpl_model = smpl_model

    def _split(self, sample: Dict) -> Iterator[Dict]:
        key = sample.get("__key__", "")
        closeup = "closeup" in key
        if closeup and sample.get("jpg") is not None:
            sample = dict(sample)
            sample["jpg"] = np.ascontiguousarray(
                np.rot90(sample["jpg"], k=-1))  # ROTATE_90_CLOCKWISE
        for person in super()._split(sample):
            if closeup:
                if person.get("jpg") is None:
                    person["_closeup_rotate"] = True  # applied in _decode
                if person["mask"] is not None:
                    # the detection mask must follow the image rotation
                    # (ref bedlam_dataset_tar.py:147-149 transposes it)
                    person["mask"] = np.ascontiguousarray(person["mask"].T)
            yield person

    def _decode(self, person: Dict) -> Dict:
        rotate = person.pop("_closeup_rotate", False)
        had_img = person.get("jpg") is not None
        person = super()._decode(person)
        if rotate and not had_img:
            person["jpg"] = np.ascontiguousarray(np.rot90(person["jpg"], k=-1))
            person["mask"] = np.ones(person["jpg"].shape[:2], bool) \
                if person["mask"].shape != person["jpg"].shape[:2] \
                else person["mask"]
        return person

    def _apply_filters(self, person: Dict) -> Optional[Dict]:
        d = person["data"]
        # BEDLAM annotations use pose_cam/shape/trans_cam/cam_* names
        if "pose_cam" in d:
            img_h, img_w = person["jpg"].shape[:2]
            pose = np.asarray(d["pose_cam"], np.float32)[: 24 * 3]
            betas = np.asarray(d["shape"], np.float32)[:10]
            cam_trans = np.asarray(d.get("trans_cam", np.zeros(3)), np.float32)
            if "cam_ext" in d:
                cam_trans = cam_trans + np.asarray(d["cam_ext"], np.float32)[:3, 3]
            if "cam_int" in d:
                cam_int = np.asarray(d["cam_int"], np.float32)
            else:
                fl = (img_w ** 2 + img_h ** 2) ** 0.5
                cam_int = np.array([[fl, 0, img_w / 2], [0, fl, img_h / 2],
                                    [0, 0, 1]], np.float32)
            if "gtkps3d" in d:
                kp3d = np.asarray(d["gtkps3d"], np.float32)
            else:
                from ..models.smpl import smpl_openpose_forward_numpy

                # OpenPose-44 layout — the flip permutation, TALS keypoint
                # thresholds and PELVIS_ID all index this order
                out = smpl_openpose_forward_numpy(
                    self.smpl_model, betas[None], pose[None])
                kp3d = out["joints"][0]
            pts = kp3d + cam_trans
            proj = pts / pts[:, 2:3]
            kp2d = (proj @ cam_int.T)[:, :2]
            d = dict(d)
            d["keypoints_2d"] = np.concatenate(
                [kp2d, np.ones((len(kp2d), 1), np.float32)], 1)
            d["keypoints_3d"] = np.concatenate(
                [kp3d, np.ones((len(kp3d), 1), np.float32)], 1)
            d["body_pose"] = pose
            d["betas"] = betas
            d["has_body_pose"] = np.array(1.0, np.float32)
            d["has_betas"] = np.array(1.0, np.float32)
            if "scale" in d and np.ndim(d["scale"]) == 0:
                d["scale"] = np.array([d["scale"], d["scale"]], np.float32)
            person["data"] = d
        return super()._apply_filters(person)


class MixedTarDataset:
    """Weighted mix of dataset streams (ref wds.RandomMix / MixedWebDataset)."""

    def __init__(self, datasets: Sequence[TarPoseDataset],
                 weights: Sequence[float], seed: int = 0):
        self.datasets = list(datasets)
        self.iters = [iter(d) for d in datasets]
        w = np.asarray(weights, np.float64)
        self.probs = w / w.sum()
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[Dict]:
        while True:
            i = int(self.rng.choice(len(self.iters), p=self.probs))
            yield next(self.iters[i])

    def iter_raw(self) -> Iterator[tuple]:
        """Weighted mix of (dataset, raw person) pairs for the parallel
        loader — the dataset tag routes each item to its own filter/augment
        implementation (e.g. BedlamTarDataset) in the worker pool."""
        raw = [d.iter_raw() for d in self.datasets]
        rng = np.random.default_rng(int(self.rng.integers(2 ** 31)))
        while True:
            i = int(rng.choice(len(raw), p=self.probs))
            yield self.datasets[i], next(raw[i])


def batched(source: Iterator[Dict], batch_size: int,
            prefetch: int = 2) -> Iterator[Dict]:
    """Collate + background-thread prefetch (ref DataLoader workers)."""
    from .npz_dataset import collate

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = object()

    def worker():
        batch: List[Dict] = []
        try:
            for item in source:
                batch.append(item)
                if len(batch) == batch_size:
                    q.put(collate(batch))
                    batch = []
        finally:
            q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item


def write_tar_shard(path: str, samples: Sequence[Dict]) -> None:
    """Write samples to a webdataset-format tar (test fixtures + data prep).

    Each sample: {'key', 'jpg' (H,W,3 uint8 RGB), 'data' (list of per-person
    dicts), optional 'masks' (P,H,W bool)}.
    """
    with tarfile.open(path, "w") as tf:
        for s in samples:
            key = s["key"]
            ok, enc = cv2.imencode(".jpg", s["jpg"][:, :, ::-1])
            assert ok
            _add_bytes(tf, f"{key}.jpg", enc.tobytes())
            _add_bytes(tf, f"{key}.data.pyd", pickle.dumps(s["data"]))
            if "masks" in s:
                bio = io.BytesIO()
                np.savez(bio, masks=s["masks"])
                _add_bytes(tf, f"{key}.detection.npz", bio.getvalue())


def _add_bytes(tf: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))
