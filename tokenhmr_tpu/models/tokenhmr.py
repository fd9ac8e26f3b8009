"""TokenHMR flagship model: ViT-H backbone -> token head -> frozen PoseVQ
decode -> SMPL -> perspective projection, as ONE jittable function.

Re-expresses ref `tokenhmr/lib/models/tokenhmr.py:135-188` (forward_step)
functionally: parameters are explicit pytrees, the frozen tokenizer is a
separate tree that receives no gradients, and the whole pixels->vertices
path compiles to a single XLA program (the reference crosses the Python/
framework boundary between backbone, head, tokenizer proxy and smplx).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import projection as proj
from .posevq import PoseVQ, PoseVQConfig, VQState, vq_dequantize_logits
from .smpl import SMPLModel, smpl_openpose_forward
from .token_head import RegressionHead, TokenHead, TokenHeadConfig
from .vit import ViT, ViTConfig, vit_apply


@dataclasses.dataclass(frozen=True)
class TokenHMRConfig:
    vit: ViTConfig = ViTConfig()
    head: TokenHeadConfig = TokenHeadConfig()
    posevq: PoseVQConfig = PoseVQConfig()
    head_type: str = "token"            # token | transformer_decoder (HMR2)
    focal_length: float = 5000.0        # EXTRA.FOCAL_LENGTH
    image_size: float = 256.0           # MODEL.IMAGE_SIZE
    update_hips: bool = False           # H36M USE_HIPS protocol (ref
                                        # smpl_wrapper.py:33-36)


class FrozenTokenizer(dict):
    """{'params': posevq decoder params, 'vq_state': VQState} — kept in a
    dict subtype so it rides pytrees naturally."""


def make_decode_fn(cfg: TokenHMRConfig, frozen: Dict[str, Any]):
    """Build the (B, T, K) simplex -> (B, 21, 6) frozen decode closure.

    Gradients never reach `frozen` because the train step only
    differentiates w.r.t. the live param tree; stop_gradient additionally
    hard-stops any accidental leak.
    """
    posevq = PoseVQ(cfg.posevq)
    fparams = jax.lax.stop_gradient(frozen["params"])
    codebook = jax.lax.stop_gradient(frozen["vq_state"].codebook)

    def decode(logits_softmax: jax.Array) -> jax.Array:
        z = vq_dequantize_logits(codebook, logits_softmax)
        return posevq.apply(fparams, z, method=PoseVQ.decode_latents)

    return decode


def init_tokenhmr(
    rng: jax.Array,
    cfg: TokenHMRConfig,
    frozen: Dict[str, Any],
    mean_params: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, Any]:
    """Initialize {backbone, head} params with a dummy batch."""
    r1, r2 = jax.random.split(rng)
    img = jnp.zeros((1,) + cfg.vit.img_size + (3,), jnp.float32)
    backbone = ViT(cfg.vit).init(r1, img)["params"]
    feats = jnp.zeros((1, cfg.vit.num_patches, cfg.vit.embed_dim), jnp.float32)
    head_mod = _make_head(cfg, frozen, mean_params)
    head = head_mod.init(r2, feats)["params"]
    return {"backbone": backbone, "head": head}


def _make_head(cfg, frozen, mean_params):
    if cfg.head_type == "token":
        return TokenHead(cfg.head, make_decode_fn(cfg, frozen), mean_params)
    elif cfg.head_type == "transformer_decoder":
        return RegressionHead(cfg.head, mean_params)
    raise ValueError(f"unknown head type {cfg.head_type}")


def forward_step(
    params: Dict[str, Any],
    frozen: Dict[str, Any],
    cfg: TokenHMRConfig,
    smpl_model: SMPLModel,
    img: jax.Array,                      # (B, 256, 192, 3) or (B, 256, 256, 3)
    train: bool = False,
    rngs: Optional[Dict[str, jax.Array]] = None,
    mean_params: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, jax.Array]:
    """Full forward (ref tokenhmr.py:135-188).  Output dict contract:

    pred_cam (B,3), pred_smpl_params {global_orient (B,1,3,3),
    body_pose (B,23,3,3), betas (B,10)}, pred_cam_t (B,3), focal_length
    (B,2), pred_vertices (B,6890,3), pred_keypoints_3d (B,44,3),
    pred_keypoints_2d (B,44,2) in [-.5,.5]-normalized crop units,
    cls_logits_softmax (token head only).
    """
    B = img.shape[0]
    bb_vars = {"params": params["backbone"]}
    if "backbone_quant" in params:
        # calibrated static-quant scales (see vit.ViTConfig.quant="calib")
        bb_vars["quant"] = params["backbone_quant"]
    feats, tok_sizes = vit_apply(cfg.vit, bb_vars, img, train=train, rngs=rngs)
    head = _make_head(cfg, frozen, mean_params)
    head_kw = {}
    if tok_sizes is not None and cfg.vit.merge_prop_attn:
        # ToMe proportional attention for the head's cross-attn over the
        # merged backbone tokens (log token sizes as a per-key bias);
        # gated on the same flag the ViT segments use so an A/B of
        # merge_prop_attn toggles backbone and head consistently
        head_kw["context_log_size"] = jnp.log(tok_sizes)
    pred_smpl_params, pred_cam, extras = head.apply(
        {"params": params["head"]}, feats, train=train, rngs=rngs, **head_kw
    )

    focal = jnp.full((B, 2), cfg.focal_length, jnp.float32)
    pred_cam_t = proj.weak_perspective_to_translation(pred_cam, focal, cfg.image_size)

    smpl_out = smpl_openpose_forward(
        smpl_model,
        pred_smpl_params["betas"],
        pred_smpl_params["global_orient"],
        pred_smpl_params["body_pose"],
        update_hips=cfg.update_hips,
    )
    kp3d = smpl_out["joints"]
    kp2d = proj.perspective_projection(kp3d, pred_cam_t, focal / cfg.image_size)

    out = {
        "pred_cam": pred_cam,
        "pred_smpl_params": pred_smpl_params,
        "pred_cam_t": pred_cam_t,
        "focal_length": focal,
        "pred_vertices": smpl_out["vertices"],
        "pred_keypoints_3d": kp3d,
        "pred_keypoints_2d": kp2d,
    }
    out.update(extras)
    return out
