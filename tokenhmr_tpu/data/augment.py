"""Host-side crop/augmentation pipeline for person-crop datasets.

Capabilities of ref `tokenhmr/lib/datasets/utils.py` (the preprocessing
kernel surface): augmentation parameter sampling, flip tables, axis-angle
rotation of global orient, 3D-keypoint rotation/flip, extreme cropping
(EFT-style part crops), crop-warp + color scale + normalization, 2D-keypoint
transform to [-0.5, 0.5] patch coords.

Differences from the reference:
  * randomness flows through an explicit np.random.Generator (no global
    `random`/`torch.rand` state)
  * the 9 part-crop variants are one table (`_PART_CROPS`) instead of 9
    near-identical functions (ref utils.py:640-872)
  * the warp backend is pluggable: cv2 (exact reference parity) or the
    native C++ kernel (tokenhmr_tpu/native) — both validated against each
    other in tests.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..ops.crop import gen_crop_affine

DEFAULT_MEAN = 255.0 * np.array([0.485, 0.456, 0.406], np.float32)
DEFAULT_STD = 255.0 * np.array([0.229, 0.224, 0.225], np.float32)

# 25 OpenPose body + 19 extra keypoint flip permutation
# (ref image_dataset.py:46-48)
BODY_PERMUTATION = [0, 1, 5, 6, 7, 2, 3, 4, 8, 12, 13, 14, 9, 10, 11, 16, 15,
                    18, 17, 22, 23, 24, 19, 20, 21]
EXTRA_PERMUTATION = [5, 4, 3, 2, 1, 0, 11, 10, 9, 8, 7, 6, 12, 13, 14, 15, 16,
                     17, 18]
FLIP_KEYPOINT_PERMUTATION = BODY_PERMUTATION + [25 + i for i in EXTRA_PERMUTATION]

# SMPL body-pose flip permutation in flattened aa coords (ref utils.py:395-400)
_BODY_POSE_PERM_69 = [6, 7, 8, 3, 4, 5, 9, 10, 11, 15, 16, 17, 12, 13,
                      14, 18, 19, 20, 24, 25, 26, 21, 22, 23, 27, 28, 29, 33,
                      34, 35, 30, 31, 32, 36, 37, 38, 42, 43, 44, 39, 40, 41,
                      45, 46, 47, 51, 52, 53, 48, 49, 50, 57, 58, 59, 54, 55,
                      56, 63, 64, 65, 60, 61, 62, 69, 70, 71, 66, 67, 68]


@dataclasses.dataclass
class AugmConfig:
    """Ref `configs/__init__.py:52-62` DATASETS.CONFIG defaults."""

    scale_factor: float = 0.3
    rot_factor: float = 30.0
    trans_factor: float = 0.02
    color_scale: float = 0.2
    rot_aug_rate: float = 0.6
    trans_aug_rate: float = 0.5
    do_flip: bool = True
    flip_aug_rate: float = 0.5
    extreme_crop_aug_rate: float = 0.10
    extreme_crop_aug_level: int = 0


@dataclasses.dataclass
class AugmParams:
    scale: float = 1.0
    rot: float = 0.0
    do_flip: bool = False
    do_extreme_crop: bool = False
    extreme_crop_lvl: int = 0
    color_scale: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    tx: float = 0.0
    ty: float = 0.0


def sample_augm_params(rng: np.random.Generator, cfg: AugmConfig) -> AugmParams:
    """Ref `do_augmentation` (utils.py:35-62)."""
    tx = float(np.clip(rng.standard_normal(), -1, 1) * cfg.trans_factor)
    ty = float(np.clip(rng.standard_normal(), -1, 1) * cfg.trans_factor)
    scale = float(np.clip(rng.standard_normal(), -1, 1) * cfg.scale_factor + 1.0)
    rot = (
        float(np.clip(rng.standard_normal(), -2, 2) * cfg.rot_factor)
        if rng.random() <= cfg.rot_aug_rate else 0.0
    )
    do_flip = cfg.do_flip and rng.random() <= cfg.flip_aug_rate
    do_extreme = rng.random() <= cfg.extreme_crop_aug_rate
    lo, hi = 1.0 - cfg.color_scale, 1.0 + cfg.color_scale
    color = tuple(float(rng.uniform(lo, hi)) for _ in range(3))
    return AugmParams(scale, rot, do_flip, do_extreme,
                      cfg.extreme_crop_aug_level, color, tx, ty)


# ---------------------------------------------------------------------------
# keypoint / parameter transforms
# ---------------------------------------------------------------------------

def fliplr_keypoints(joints: np.ndarray, width: float,
                     flip_permutation: List[int]) -> np.ndarray:
    """Ref utils.py:451-466."""
    joints = joints.copy()
    joints[:, 0] = width - joints[:, 0] - 1
    return joints[flip_permutation]


def keypoint_3d_processing(kp3d: np.ndarray, flip_permutation: List[int],
                           rot: float, do_flip: bool) -> np.ndarray:
    """Rotate/flip 3D keypoints (ref utils.py:468-490)."""
    if do_flip:
        kp3d = fliplr_keypoints(kp3d, 1, flip_permutation)
    kp3d = kp3d.copy()
    if rot != 0:
        rot_rad = -rot * np.pi / 180
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        rot_mat = np.eye(3)
        rot_mat[0, :2] = [cs, -sn]
        rot_mat[1, :2] = [sn, cs]
        kp3d[:, :-1] = np.einsum("ij,kj->ki", rot_mat, kp3d[:, :-1])
    return kp3d.astype(np.float32)


def rot_aa(aa: np.ndarray, rot: float) -> np.ndarray:
    """Rotate an axis-angle vector by an in-plane rotation (ref utils.py:463-481)."""
    if rot == 0:
        return aa.astype(np.float32)
    R = np.array(
        [[np.cos(np.deg2rad(-rot)), -np.sin(np.deg2rad(-rot)), 0],
         [np.sin(np.deg2rad(-rot)), np.cos(np.deg2rad(-rot)), 0],
         [0, 0, 1]]
    )
    # Rodrigues without cv2 (keep host path dependency-free)
    angle = np.linalg.norm(aa)
    if angle < 1e-8:
        per = np.eye(3)
    else:
        k = aa / angle
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        per = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
    res = R @ per
    # matrix -> axis-angle
    cos_a = np.clip((np.trace(res) - 1) / 2, -1, 1)
    a = np.arccos(cos_a)
    if a < 1e-8:
        return np.zeros(3, np.float32)
    axis = np.array([res[2, 1] - res[1, 2], res[0, 2] - res[2, 0],
                     res[1, 0] - res[0, 1]]) / (2 * np.sin(a))
    return (axis * a).astype(np.float32)


def fliplr_params(smpl_params: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Mirror SMPL parameters (ref utils.py:378-436)."""
    go = smpl_params["global_orient"].copy().reshape(-1)
    bp = smpl_params["body_pose"].copy().reshape(-1)
    perm = [i - 3 for i in _BODY_POSE_PERM_69[: len(bp)]]
    bp = bp[perm]
    go[1::3] *= -1
    go[2::3] *= -1
    bp[1::3] *= -1
    bp[2::3] *= -1
    return {
        "global_orient": go.astype(np.float32),
        "body_pose": bp.astype(np.float32),
        "betas": smpl_params["betas"].astype(np.float32),
    }


def smpl_param_processing(smpl_params: Dict[str, np.ndarray], rot: float,
                          do_flip: bool) -> Dict[str, np.ndarray]:
    """Ref utils.py:483-500."""
    if do_flip:
        smpl_params = fliplr_params(smpl_params)
    out = dict(smpl_params)
    out["global_orient"] = rot_aa(smpl_params["global_orient"].reshape(-1), rot)
    return out


# ---------------------------------------------------------------------------
# extreme cropping (EFT part crops) — ref utils.py:640-1002
# ---------------------------------------------------------------------------

def get_bbox(kp2d: np.ndarray, rescale: float = 1.2):
    valid = kp2d[:, -1] > 0
    vk = kp2d[valid][:, :-1]
    center = 0.5 * (vk.max(axis=0) + vk.min(axis=0))
    scale = (vk.max(axis=0) - vk.min(axis=0)) * rescale
    return center, scale


# (zeroed keypoint indices, bbox expansion factor) per part-crop variant
_PART_CROPS = {
    "hips": ([10, 11, 13, 14, 19, 20, 21, 22, 23, 24, 25, 26, 29, 30], 1.1),
    "shoulders": ([3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 19, 20, 21, 22, 23, 24]
                  + [25 + i for i in [0, 1, 2, 3, 4, 5, 6, 7, 10, 11, 14, 15, 16]], 1.2),
    "head": ([3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 19, 20, 21, 22, 23, 24]
             + [25 + i for i in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 14, 15, 16]], 1.3),
    "torso": ([0, 3, 4, 6, 7, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24]
              + [25 + i for i in [0, 1, 4, 5, 6, 7, 10, 11, 13, 17, 18]], 1.1),
    "rightarm": ([0, 1, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
                  21, 22, 23, 24]
                 + [25 + i for i in [0, 1, 2, 3, 4, 5, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18]], 1.1),
    "leftarm": ([0, 1, 2, 3, 4, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
                 21, 22, 23, 24]
                + [25 + i for i in [0, 1, 2, 3, 4, 5, 6, 7, 8, 12, 13, 14, 15, 16, 17, 18]], 1.1),
    "legs": ([0, 1, 2, 3, 4, 5, 6, 7, 15, 16, 17, 18]
             + [25 + i for i in [6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 17, 18]], 1.1),
    "rightleg": ([0, 1, 2, 3, 4, 5, 6, 7, 8, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21]
                 + [25 + i for i in [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18]], 1.1),
    "leftleg": ([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 15, 16, 17, 18, 22, 23, 24]
                + [25 + i for i in [0, 1, 2, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18]], 1.1),
}


def _part_crop(name: str, cx, cy, w, h, kp2d: np.ndarray):
    zeroed, factor = _PART_CROPS[name]
    kp = kp2d.copy()
    kp[zeroed, :] = 0
    if kp[:, -1].sum() > 1:
        center, scale = get_bbox(kp)
        return center[0], center[1], factor * scale[0], factor * scale[1]
    return cx, cy, w, h


def full_body_visible(kp2d: np.ndarray) -> bool:
    """Ref utils.py:877-888."""
    body_op = [2, 3, 4, 5, 6, 7, 10, 11, 13, 14]
    body_ex = [25 + i for i in [8, 7, 6, 9, 10, 11, 1, 0, 4, 5]]
    return int((np.maximum(kp2d[body_ex, -1], kp2d[body_op, -1]) > 0).sum()) == len(body_ex)


def upper_body_visible(kp2d: np.ndarray) -> bool:
    """Ref utils.py:890-902."""
    lower = [10, 11, 13, 14] + [25 + i for i in [1, 0, 4, 5]]
    upper = [0, 1, 15, 16, 17, 18] + [25 + 8, 25 + 9, 25 + 12, 25 + 13, 25 + 17, 25 + 18]
    return ((kp2d[lower, -1] > 0).sum() == 0) and ((kp2d[upper, -1] > 0).sum() >= 2)


def extreme_cropping(cx, cy, w, h, kp2d: np.ndarray, p: float,
                     aggressive: bool = False):
    """Part-crop policy (ref utils.py:923-1002).  p in [0,1) replaces the
    reference's torch.rand draw."""
    if aggressive:
        if full_body_visible(kp2d):
            order = ["hips", "shoulders", "head", "torso", "rightarm",
                     "leftarm", "legs", "rightleg", "leftleg"]
            name = order[min(int(p * 10), 8)] if p < 0.9 else "leftleg"
            cx, cy, w, h = _part_crop(name, cx, cy, w, h, kp2d)
        elif upper_body_visible(kp2d):
            order = ["shoulders", "head", "torso", "rightarm", "leftarm"]
            name = order[min(int(p * 5), 4)]
            cx, cy, w, h = _part_crop(name, cx, cy, w, h, kp2d)
    else:
        if full_body_visible(kp2d):
            name = "hips" if p < 0.7 else ("shoulders" if p < 0.9 else "head")
            cx, cy, w, h = _part_crop(name, cx, cy, w, h, kp2d)
        elif upper_body_visible(kp2d):
            name = "shoulders" if p < 0.9 else "head"
            cx, cy, w, h = _part_crop(name, cx, cy, w, h, kp2d)
    return cx, cy, max(w, h), max(w, h)


# ---------------------------------------------------------------------------
# warp backends
# ---------------------------------------------------------------------------

def warp_affine_cv2(img: np.ndarray, trans: np.ndarray, out_wh: Tuple[int, int],
                    border_value=0) -> np.ndarray:
    assert cv2 is not None, "cv2 backend unavailable"
    return cv2.warpAffine(
        img, trans, out_wh, flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=border_value,
    )


_WARP_BACKEND = [warp_affine_cv2]


def set_warp_backend(fn) -> None:
    """Swap the host warp implementation (e.g. the native C++ kernel)."""
    _WARP_BACKEND[0] = fn


def generate_image_patch(
    img: np.ndarray, c_x, c_y, bb_width, bb_height, patch_width, patch_height,
    do_flip: bool, scale: float, rot: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Crop+warp (ref generate_image_patch_cv2, utils.py:317-360)."""
    img_height, img_width = img.shape[:2]
    if do_flip:
        img = img[:, ::-1]
        c_x = img_width - c_x - 1
    trans = gen_crop_affine(c_x, c_y, bb_width, bb_height,
                            patch_width, patch_height, scale, rot)
    patch = _WARP_BACKEND[0](img, trans, (int(patch_width), int(patch_height)))
    return patch, trans


# ---------------------------------------------------------------------------
# get_example — the master per-item pipeline (ref utils.py:501-638)
# ---------------------------------------------------------------------------

def get_example(
    img: np.ndarray,                   # (H, W, 3) RGB uint8
    center_x: float, center_y: float,
    width: float, height: float,
    keypoints_2d: np.ndarray,          # (44, 3)
    keypoints_3d: np.ndarray,          # (44, 4)
    smpl_params: Dict[str, np.ndarray],
    has_smpl_params: Dict[str, np.ndarray],
    patch_width: int = 256,
    patch_height: int = 256,
    mean: np.ndarray = DEFAULT_MEAN,
    std: np.ndarray = DEFAULT_STD,
    do_augment: bool = False,
    augm_config: Optional[AugmConfig] = None,
    rng: Optional[np.random.Generator] = None,
    flip_kp_permutation: List[int] = FLIP_KEYPOINT_PERMUTATION,
    return_trans: bool = False,
    use_antialias: bool = False,
):
    """Returns (img_patch (H,W,3) float32 normalized, kp2d, kp3d,
    smpl_params, has_smpl_params, img_size).  NHWC layout (the reference
    emits CHW; our models are channels-last)."""
    rng = rng or np.random.default_rng()
    img_size = np.array([img.shape[0], img.shape[1]])

    if do_augment:
        aug = sample_augm_params(rng, augm_config or AugmConfig())
    else:
        aug = AugmParams()

    if aug.do_extreme_crop:
        p = float(rng.random())
        cx1, cy1, w1, h1 = extreme_cropping(
            center_x, center_y, width, height, keypoints_2d, p,
            aggressive=aug.extreme_crop_lvl == 1,
        )
        if w1 >= 4 and h1 >= 4:
            center_x, center_y, width, height = cx1, cy1, w1, h1

    center_x += width * aug.tx
    center_y += height * aug.ty

    keypoints_3d = keypoint_3d_processing(
        keypoints_3d, flip_kp_permutation, aug.rot, aug.do_flip
    )

    if use_antialias and cv2 is not None:
        # gaussian pre-blur when heavily downsampling (ref utils.py:594-598
        # use_skimage_antialias; sigma=(factor-1)/2)
        factor = patch_width / max(width * aug.scale, 1e-6)
        if factor > 1.1:
            sigma = (factor - 1) / 2
            img = cv2.GaussianBlur(img, (0, 0), sigmaX=sigma, sigmaY=sigma)

    patch, trans = generate_image_patch(
        img, center_x, center_y, width, height, patch_width, patch_height,
        aug.do_flip, aug.scale, aug.rot,
    )
    patch = patch.astype(np.float32)

    smpl_params = smpl_param_processing(smpl_params, aug.rot, aug.do_flip)

    # color scale + normalize (channels-last); extra channels (e.g. the RGBA
    # detection mask, ref image_dataset.py:494-510) pass through with scale 1
    C = patch.shape[2]
    cs = np.ones(C, np.float32)
    cs[:3] = np.asarray(aug.color_scale, np.float32)[: min(3, C)]
    patch = np.clip(patch * cs, 0, 255)
    patch = (patch - np.asarray(mean, np.float32)[:C]) / np.asarray(std, np.float32)[:C]

    kp2d = keypoints_2d.copy()
    if aug.do_flip:
        kp2d = fliplr_keypoints(kp2d, img_size[1], flip_kp_permutation)
    ones = np.ones((kp2d.shape[0], 1))
    kp2d[:, :2] = (np.concatenate([kp2d[:, :2], ones], axis=1) @ trans.T)
    kp2d[:, :-1] = kp2d[:, :-1] / patch_width - 0.5

    out = (patch, kp2d.astype(np.float32), keypoints_3d, smpl_params,
           has_smpl_params, img_size)
    return out + (trans,) if return_trans else out
