"""PyTorch checkpoint -> JAX param-tree converters.

Parity with the reference is defined against its RELEASED weights
(SURVEY.md §7): `tokenizer.pth` ({'net': state_dict, 'hparams': yacs},
ref `eval_poseVQ.py:118-125`) and the Lightning TokenHMR ckpt
(`backbone.*` / `smpl_head.*` prefixes, ref `misc.py:215-256`).  These
converters map those state dicts onto our flax trees.

Key layout translations:
  torch Linear  (out, in)        -> flax kernel (in, out)
  torch Conv1d  (out, in, k)     -> flax kernel (k, in, out)
  torch Conv2d  (out, in, kh, kw)-> flax kernel (kh, kw, in, out)
  unrolled torch blocks.{i}.*    -> scanned flax blocks/* stacked on axis 0
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t(w):
    return np.asarray(w, np.float32).T


def _conv1d(w):
    return np.asarray(w, np.float32).transpose(2, 1, 0)


def _conv2d(w):
    return np.asarray(w, np.float32).transpose(2, 3, 1, 0)


def _np(w):
    return np.asarray(w, np.float32)


class ConversionError(RuntimeError):
    pass


class _StateDict:
    """Tracking wrapper: every key must be consumed exactly once."""

    def __init__(self, sd: Dict[str, Any], name: str = "ckpt"):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()
        self.name = name

    def take(self, key: str):
        if key not in self.sd:
            raise ConversionError(f"{self.name}: missing key {key!r}")
        self.used.add(key)
        return self.sd[key]

    def maybe(self, key: str):
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        return None

    def assert_consumed(self, ignore: Tuple[str, ...] = ()):
        left = [k for k in self.sd if k not in self.used
                and not any(re.search(p, k) for p in ignore)]
        if left:
            raise ConversionError(
                f"{self.name}: {len(left)} unconsumed keys, e.g. {left[:8]}"
            )


# ---------------------------------------------------------------------------
# PoseVQ tokenizer (tokenizer.pth)
# ---------------------------------------------------------------------------

def _convert_resnet1d(sd: _StateDict, prefix: str, depth: int) -> Dict:
    out = {}
    for j in range(depth):
        out[f"block{j}"] = {
            "conv1": {"conv": {
                "kernel": _conv1d(sd.take(f"{prefix}.model.{j}.conv1.weight")),
                "bias": _np(sd.take(f"{prefix}.model.{j}.conv1.bias")),
            }},
            "conv2": {"conv": {
                "kernel": _conv1d(sd.take(f"{prefix}.model.{j}.conv2.weight")),
                "bias": _np(sd.take(f"{prefix}.model.{j}.conv2.bias")),
            }},
        }
    return out


def _conv_entry(sd: _StateDict, key: str) -> Dict:
    return {"conv": {
        "kernel": _conv1d(sd.take(f"{key}.weight")),
        "bias": _np(sd.take(f"{key}.bias")),
    }}


def convert_posevq_state_dict(
    net: Dict[str, np.ndarray],
    token_size_mul: int = 4,
    token_size_div: int = 4,
    down_t: int = 1,
    depth: int = 2,
) -> Tuple[Dict, np.ndarray]:
    """torch `net` state dict -> ({'params': flax tree}, codebook).

    Sequential index layout follows ref PoseSPEncoderV1/PoseSPDecoderV1
    construction (`vanilla_pose_vqvae.py:56-91, 133-158`).
    """
    sd = _StateDict(net, "tokenizer")
    enc: Dict[str, Any] = {}

    # encoder: [Conv, ReLU, Upsample, Conv, ReLU] + (mul-1)*[Up, Conv, ReLU]
    #          + down_t*[Sequential(Conv, Resnet1D)] + [Conv]
    idx = 0
    enc["in_conv"] = _conv_entry(sd, f"encoder.{idx}"); idx += 2   # conv, relu
    idx += 1                                                        # upsample
    enc["base_conv"] = _conv_entry(sd, f"encoder.{idx}"); idx += 2
    for i in range(token_size_mul - 1):
        idx += 1                                                    # upsample
        enc[f"up_conv{i}"] = _conv_entry(sd, f"encoder.{idx}"); idx += 2
    for i in range(down_t):
        enc[f"down_conv{i}"] = _conv_entry(sd, f"encoder.{idx}.0")
        enc[f"down_res{i}"] = _convert_resnet1d(sd, f"encoder.{idx}.1", depth)
        idx += 1
    enc["out_conv"] = _conv_entry(sd, f"encoder.{idx}")

    # decoder: [Conv, ReLU] + div*[Up, Conv, ReLU]
    #          + down_t*[Sequential(Resnet1D, Conv)] + [Conv]
    dec: Dict[str, Any] = {}
    idx = 0
    dec["in_conv"] = _conv_entry(sd, f"decoder.{idx}"); idx += 2
    for i in range(token_size_div):
        idx += 1
        dec[f"up_conv{i}"] = _conv_entry(sd, f"decoder.{idx}"); idx += 2
    for i in range(down_t):
        dec[f"up_res{i}"] = _convert_resnet1d(sd, f"decoder.{idx}.0", depth)
        dec[f"res_conv{i}"] = _conv_entry(sd, f"decoder.{idx}.1")
        idx += 1
    dec["out_conv"] = _conv_entry(sd, f"decoder.{idx}")

    codebook = _np(sd.take("codebook"))
    sd.assert_consumed(ignore=(r"^body_model", r"code_sum", r"code_count"))
    return {"params": {"encoder": enc, "decoder": dec}}, codebook


def load_tokenizer_checkpoint(path: str):
    """tokenizer.pth -> (PoseVQConfig, flax params, VQState).

    Reconstructs the architecture from ckpt['hparams'].ARCH — the
    self-describing-checkpoint property (ref vanilla_pose_vqvae.py:265-278).
    """
    import jax.numpy as jnp
    import torch

    from ..models.posevq import PoseVQConfig, VQState

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    arch = ckpt["hparams"].ARCH
    cfg = PoseVQConfig(
        code_dim=int(arch.CODE_DIM), nb_code=int(arch.NB_CODE),
        width=int(arch.WIDTH), depth=int(arch.DEPTH),
        dilation_growth_rate=int(arch.DILATION_RATE),
        down_t=int(arch.DOWN_T), token_size_mul=int(arch.TOKEN_SIZE_MUL),
        token_size_div=int(arch.TOKEN_SIZE_DIV),
    )
    net = {k: v.numpy() for k, v in ckpt["net"].items()
           if not k.startswith("body_model")}
    # strip the VanillaTokenizer prefixes: encoder.encoder.N -> encoder.N
    renamed = {}
    for k, v in net.items():
        k2 = re.sub(r"^encoder\.encoder\.", "encoder.", k)
        k2 = re.sub(r"^decoder\.decoder\.", "decoder.", k2)
        k2 = re.sub(r"^quantizer\.codebook$", "codebook", k2)
        renamed[k2] = v
    params, codebook = convert_posevq_state_dict(
        renamed, cfg.token_size_mul, cfg.token_size_div, cfg.down_t, cfg.depth
    )
    K, D = codebook.shape
    vq_state = VQState(
        codebook=jnp.asarray(codebook),
        code_sum=jnp.asarray(codebook),
        code_count=jnp.ones((K,), jnp.float32),
        initialized=jnp.asarray(True),
    )
    return cfg, {"params": params["params"]}, vq_state


# ---------------------------------------------------------------------------
# ViT backbone (backbone.* keys of the Lightning ckpt / ViTPose / HMR2)
# ---------------------------------------------------------------------------

def convert_vit_state_dict(sd_raw: Dict[str, np.ndarray], depth: int = 32) -> Dict:
    """torch ViT state dict (unrolled blocks) -> flax tree (scanned blocks)."""
    sd = _StateDict(sd_raw, "vit")
    out: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv2d(sd.take("patch_embed.proj.weight")),
            "bias": _np(sd.take("patch_embed.proj.bias")),
        },
        "pos_embed": _np(sd.take("pos_embed")),
        "last_norm": {
            "scale": _np(sd.take("last_norm.weight")),
            "bias": _np(sd.take("last_norm.bias")),
        },
    }

    def stack(fn):
        return np.stack([fn(i) for i in range(depth)])

    out["blocks"] = {
        "norm1": {
            "scale": stack(lambda i: _np(sd.take(f"blocks.{i}.norm1.weight"))),
            "bias": stack(lambda i: _np(sd.take(f"blocks.{i}.norm1.bias"))),
        },
        "norm2": {
            "scale": stack(lambda i: _np(sd.take(f"blocks.{i}.norm2.weight"))),
            "bias": stack(lambda i: _np(sd.take(f"blocks.{i}.norm2.bias"))),
        },
        "attn": {
            "qkv": {
                "kernel": stack(lambda i: _t(sd.take(f"blocks.{i}.attn.qkv.weight"))),
                "bias": stack(lambda i: _np(sd.take(f"blocks.{i}.attn.qkv.bias"))),
            },
            "proj": {
                "kernel": stack(lambda i: _t(sd.take(f"blocks.{i}.attn.proj.weight"))),
                "bias": stack(lambda i: _np(sd.take(f"blocks.{i}.attn.proj.bias"))),
            },
        },
        "mlp": {
            "fc1": {
                "kernel": stack(lambda i: _t(sd.take(f"blocks.{i}.mlp.fc1.weight"))),
                "bias": stack(lambda i: _np(sd.take(f"blocks.{i}.mlp.fc1.bias"))),
            },
            "fc2": {
                "kernel": stack(lambda i: _t(sd.take(f"blocks.{i}.mlp.fc2.weight"))),
                "bias": stack(lambda i: _np(sd.take(f"blocks.{i}.mlp.fc2.bias"))),
            },
        },
    }
    sd.assert_consumed(ignore=(r"cls_token",))
    return out


# ---------------------------------------------------------------------------
# Token head (smpl_head.* keys)
# ---------------------------------------------------------------------------

def _linear(sd: _StateDict, key: str, bias: bool = True) -> Dict:
    d = {"kernel": _t(sd.take(f"{key}.weight"))}
    if bias:
        d["bias"] = _np(sd.take(f"{key}.bias"))
    return d


def _ln(sd: _StateDict, key: str) -> Dict:
    return {"scale": _np(sd.take(f"{key}.weight")),
            "bias": _np(sd.take(f"{key}.bias"))}


def _fcblock(sd: _StateDict, key: str) -> Dict:
    """ref FCBlock: Sequential(Linear, LayerNorm, ReLU) (modules.py:11-22)."""
    return {"fc": _linear(sd, f"{key}.0"), "ln": _ln(sd, f"{key}.1")}


def _mlpblock(sd: _StateDict, key: str) -> Dict:
    """ref MLPBlock: Sequential(Linear, GELU, Drop, Linear, Drop)."""
    return {"fc1": _linear(sd, f"{key}.0"), "fc2": _linear(sd, f"{key}.3")}


def convert_token_head_state_dict(
    sd_raw: Dict[str, np.ndarray], depth: int = 6, num_mixer_blocks: int = 4
) -> Dict:
    """smpl_head.* (prefix stripped) -> flax TokenHead tree."""
    sd = _StateDict(sd_raw, "head")
    out: Dict[str, Any] = {}

    # transformer decoder (ref TransformerDecoder + TransformerCrossAttn)
    tr: Dict[str, Any] = {
        "to_token_embedding": _linear(sd, "transformer.to_token_embedding"),
        "pos_embedding": _np(sd.take("transformer.pos_embedding")),
    }
    inner: Dict[str, Any] = {}
    for i in range(depth):
        L = f"transformer.transformer.layers.{i}"
        inner[f"sa_norm{i}"] = _ln(sd, f"{L}.0.norm")
        inner[f"sa{i}"] = {
            "to_qkv": _linear(sd, f"{L}.0.fn.to_qkv", bias=False),
            "to_out": _linear(sd, f"{L}.0.fn.to_out.0"),
        }
        inner[f"ca_norm{i}"] = _ln(sd, f"{L}.1.norm")
        inner[f"ca{i}"] = {
            "to_kv": _linear(sd, f"{L}.1.fn.to_kv", bias=False),
            "to_q": _linear(sd, f"{L}.1.fn.to_q", bias=False),
            "to_out": _linear(sd, f"{L}.1.fn.to_out.0"),
        }
        inner[f"ff_norm{i}"] = _ln(sd, f"{L}.2.norm")
        inner[f"ff{i}"] = {
            "fc1": _linear(sd, f"{L}.2.fn.net.0"),
            "fc2": _linear(sd, f"{L}.2.fn.net.3"),
        }
    tr["transformer"] = inner
    out["transformer"] = tr

    out["decpose_grot"] = _linear(sd, "decpose_grot")
    out["decpose_hands"] = _linear(sd, "decpose_hands")
    out["decshape"] = _linear(sd, "decshape")
    out["deccam"] = _linear(sd, "deccam")

    # TokenClassifier (ref token_classifier.py:66-87)
    cls: Dict[str, Any] = {
        "mixer_trans": _fcblock(sd, "decpose.mixer_trans.ff"),
        "mixer_norm": _fcblock(sd, "decpose.mixer_norm_layer.ff"),
        "class_pred": _linear(sd, "decpose.class_pred_layer"),
    }
    for i in range(num_mixer_blocks):
        M = f"decpose.mixer_head.{i}"
        cls[f"mixer{i}"] = {
            "ln1": _ln(sd, f"{M}.layernorm1"),
            "ln2": _ln(sd, f"{M}.layernorm2"),
            "mlp_token": _mlpblock(sd, f"{M}.MLP_token.ff"),
            "mlp_channel": _mlpblock(sd, f"{M}.MLP_channel.ff"),
        }
    out["decpose"] = cls

    sd.assert_consumed(ignore=(r"init_body_pose", r"init_betas", r"init_cam",
                               r"decpose\.tokenize"))
    init = {}
    for k in ("init_body_pose", "init_betas", "init_cam"):
        v = sd.maybe(k)
        if v is not None:
            init[k] = _np(v).reshape(-1)
    return out, init


# ---------------------------------------------------------------------------
# Full TokenHMR Lightning checkpoint
# ---------------------------------------------------------------------------

def split_lightning_state_dict(sd: Dict[str, np.ndarray]):
    """Split `backbone.*` / `smpl_head.*` prefixes (ref misc.py:215-256)."""
    backbone, head = {}, {}
    for k, v in sd.items():
        if k.startswith("backbone."):
            backbone[k[len("backbone."):]] = v
        elif k.startswith("smpl_head."):
            head[k[len("smpl_head."):]] = v
    return backbone, head


def load_tokenhmr_checkpoint(
    ckpt_path: str,
    tokenizer_path: Optional[str] = None,
    vit_depth: int = 32,
    vit_cfg=None,
    head_cfg=None,
):
    """Lightning ckpt (+ tokenizer.pth) -> (TokenHMRConfig, params, frozen).

    vit_cfg/head_cfg: optional architecture overrides (default: release
    ViT-H + token head) — lets non-release checkpoints (tiny test
    fixtures, ablation sizes) ride the same assembly path."""
    import torch

    from ..models.tokenhmr import TokenHMRConfig

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    backbone_sd, head_sd = split_lightning_state_dict(sd)

    if vit_cfg is not None:
        vit_depth = vit_cfg.depth
    backbone = convert_vit_state_dict(backbone_sd, depth=vit_depth)
    head_kw = {}
    if head_cfg is not None:
        head_kw = dict(depth=head_cfg.decoder.depth,
                       num_mixer_blocks=head_cfg.num_mixer_blocks)
    head, init = convert_token_head_state_dict(head_sd, **head_kw)

    mean_params = None
    if init:
        mean_params = {
            "pose": init.get("init_body_pose"),
            "shape": init.get("init_betas"),
            "cam": init.get("init_cam"),
        }

    if tokenizer_path is not None:
        pq_cfg, pq_params, vq_state = load_tokenizer_checkpoint(tokenizer_path)
    else:
        raise ConversionError("tokenizer checkpoint required for the token head")

    cfg_kw = {}
    if vit_cfg is not None:
        cfg_kw["vit"] = vit_cfg
    if head_cfg is not None:
        cfg_kw["head"] = head_cfg
    cfg = TokenHMRConfig(posevq=pq_cfg, **cfg_kw)
    params = {"backbone": backbone, "head": head}
    frozen = {"params": pq_params, "vq_state": vq_state}
    return cfg, params, frozen, mean_params
