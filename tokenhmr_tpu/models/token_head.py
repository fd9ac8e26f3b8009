"""Token-prediction SMPL head: cross-attn decoder + MLP-Mixer token
classifier + frozen PoseVQ decode.

Capabilities of ref `tokenhmr/lib/models/heads/token_head.py` (the TokenHMR
head), `heads/token_classifier.py` and `heads/modules.py`, as one functional
flax module.  The frozen tokenizer is NOT a lazily device-moved Proxy
(ref `token_classifier.py:12-20`); its params live in a separate tree passed
explicitly and receive no gradient.

Outputs follow the reference contract: dict of SMPL params with rotmats,
weak-persp cam, and the softmaxed token logits for the token CE loss.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotations import rotation_6d_to_matrix
from .transformer import DecoderConfig, TransformerDecoder

# identity rotation in TokenHMR 6D convention (rows of I)
_ID6 = np.array([1, 0, 0, 0, 1, 0], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class TokenHeadConfig:
    num_body_joints: int = 23            # SMPL body joints (excl. root)
    token_num: int = 160                 # TOKEN_NUM
    token_class_num: int = 2048          # TOKEN_CLASS_NUM
    ief_iters: int = 1                   # IEF_ITERS
    decoder: DecoderConfig = DecoderConfig()
    # mixer hyperparams (ref token_classifier.py:57-64)
    hidden_dim: int = 64
    num_mixer_blocks: int = 4
    hidden_inter_dim: int = 256
    token_inter_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def npose(self) -> int:
        return 6 * (self.num_body_joints + 1)


def default_mean_params(cfg: TokenHeadConfig) -> Dict[str, np.ndarray]:
    """Fallback when `smpl_mean_params.npz` (ref SMPL.MEAN_PARAMS) is absent:
    identity pose, zero betas, forward-facing weak-persp cam."""
    return {
        "pose": np.tile(_ID6, cfg.num_body_joints + 1).astype(np.float32),
        "shape": np.zeros(10, np.float32),
        "cam": np.array([0.9, 0.0, 0.0], np.float32),
    }


def load_mean_params(path: str) -> Dict[str, np.ndarray]:
    """Load the HMR mean-parameter npz (ref token_head.py:57-63)."""
    d = np.load(path)
    return {
        "pose": d["pose"].astype(np.float32),
        "shape": d["shape"].astype(np.float32),
        "cam": d["cam"].astype(np.float32),
    }


class FCBlock(nn.Module):
    """Linear -> LayerNorm -> ReLU (ref modules.py:11-22)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(x)
        # epsilon=1e-5: torch nn.LayerNorm default (ref modules.py:17)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x).astype(self.dtype)
        return nn.relu(x)


class MLPBlock(nn.Module):
    """Linear -> GELU -> Linear (ref modules.py:25-38; dropout 0 in release)."""

    inter_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inter_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(h)


class MixerLayer(nn.Module):
    """Token-mix + channel-mix (ref modules.py:41-63, incl. the x+y+z skip)."""

    cfg: TokenHeadConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x).astype(c.dtype)
        y = jnp.swapaxes(y, -1, -2)                       # (B, hidden, tokens)
        y = MLPBlock(c.token_inter_dim, c.token_num, dtype=c.dtype, name="mlp_token")(y)
        y = jnp.swapaxes(y, -1, -2)
        z = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x + y).astype(c.dtype)
        z = MLPBlock(c.hidden_inter_dim, c.hidden_dim, dtype=c.dtype, name="mlp_channel")(z)
        return x + y + z


class TokenClassifier(nn.Module):
    """feature (B, dim) -> token-class simplex (B, token_num, class_num).

    Ref `token_classifier.py:89-108` up to (and including) the softmax; the
    frozen-decoder tokenize step is composed by the caller.
    """

    cfg: TokenHeadConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B = x.shape[0]
        h = FCBlock(c.token_num * c.hidden_dim, dtype=c.dtype, name="mixer_trans")(x)
        h = h.reshape(B, c.token_num, c.hidden_dim)
        for i in range(c.num_mixer_blocks):
            h = MixerLayer(c, name=f"mixer{i}")(h)
        h = FCBlock(c.hidden_dim, dtype=c.dtype, name="mixer_norm")(h)
        logits = nn.Dense(c.token_class_num, dtype=c.dtype, name="class_pred")(h)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


class TokenHead(nn.Module):
    """The full SMPL token head (ref token_head.py:65-128).

    `decode_tokens` maps the (B, token_num, class_num) simplex to body pose
    6D (B, 21, 6) through the FROZEN PoseVQ decoder — passed as a callable
    closing over the frozen tokenizer params so no gradient flows to it.
    """

    cfg: TokenHeadConfig
    decode_tokens: Callable[[jax.Array], jax.Array]
    mean_params: Optional[Dict[str, np.ndarray]] = None

    @nn.compact
    def __call__(self, context, train: bool = False, context_log_size=None):
        c = self.cfg
        B = context.shape[0]
        means = self.mean_params or default_mean_params(c)
        init_pose = jnp.asarray(means["pose"])[None].repeat(B, 0)
        init_betas = jnp.asarray(means["shape"])[None].repeat(B, 0)
        init_cam = jnp.asarray(means["cam"])[None].repeat(B, 0)

        pred_pose, pred_betas, pred_cam = init_pose, init_betas, init_cam
        cls_softmax = None
        for _ in range(c.ief_iters):
            token = jnp.zeros((B, 1, 1), context.dtype)  # zero query token
            tok = TransformerDecoder(c.decoder, name="transformer")(
                token, context, train=train, context_bias=context_log_size
            )[:, 0]                                       # (B, dim)
            grot = nn.Dense(6, dtype=c.dtype, name="decpose_grot")(tok)
            hands = nn.Dense(12, dtype=c.dtype, name="decpose_hands")(tok)
            cls_softmax = TokenClassifier(c, name="decpose")(tok)
            bpose = self.decode_tokens(cls_softmax).reshape(B, -1)  # (B, 126)
            pred_pose = jnp.concatenate([grot, bpose, hands], axis=-1) + pred_pose
            pred_betas = nn.Dense(10, dtype=c.dtype, name="decshape")(tok) + pred_betas
            pred_cam = nn.Dense(3, dtype=c.dtype, name="deccam")(tok) + pred_cam

        rotmats = rotation_6d_to_matrix(
            pred_pose.reshape(B, c.num_body_joints + 1, 6)
        )
        pred_smpl_params = {
            "global_orient": rotmats[:, :1],
            "body_pose": rotmats[:, 1:],
            "betas": pred_betas,
        }
        return pred_smpl_params, pred_cam, {"cls_logits_softmax": cls_softmax}


class RegressionHead(nn.Module):
    """HMR2-style direct-regression head (ref heads/smpl_head.py): identical
    structure, body pose read out by a single Linear instead of tokens."""

    cfg: TokenHeadConfig
    mean_params: Optional[Dict[str, np.ndarray]] = None

    @nn.compact
    def __call__(self, context, train: bool = False, context_log_size=None):
        c = self.cfg
        B = context.shape[0]
        means = self.mean_params or default_mean_params(c)
        pred_pose = jnp.asarray(means["pose"])[None].repeat(B, 0)
        pred_betas = jnp.asarray(means["shape"])[None].repeat(B, 0)
        pred_cam = jnp.asarray(means["cam"])[None].repeat(B, 0)
        for _ in range(c.ief_iters):
            token = jnp.zeros((B, 1, 1), context.dtype)
            tok = TransformerDecoder(c.decoder, name="transformer")(
                token, context, train=train, context_bias=context_log_size
            )[:, 0]
            pred_pose = nn.Dense(c.npose, dtype=c.dtype, name="decpose")(tok) + pred_pose
            pred_betas = nn.Dense(10, dtype=c.dtype, name="decshape")(tok) + pred_betas
            pred_cam = nn.Dense(3, dtype=c.dtype, name="deccam")(tok) + pred_cam
        rotmats = rotation_6d_to_matrix(pred_pose.reshape(B, c.num_body_joints + 1, 6))
        pred_smpl_params = {
            "global_orient": rotmats[:, :1],
            "body_pose": rotmats[:, 1:],
            "betas": pred_betas,
        }
        return pred_smpl_params, pred_cam, {}
