"""Cross-attention transformer decoder for the SMPL head.

Capabilities of ref `tokenhmr/lib/models/components/pose_transformer.py`:
pre-norm TransformerCrossAttn (self-attn, cross-attn over backbone tokens,
FFN), learned query pos-embed, token-dropout variants.  Query length is 1
in TokenHMR, context is the 192 ViT tokens.

The AdaptiveLayerNorm1D / FrequencyEmbedder conditional-MLP machinery of
`t_cond_mlp.py` is intentionally dropped: TokenHMR's released configs use
plain LayerNorm (`norm: layer`), and conditional norm was dead code there.
"""
from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Ref `configs_hydra/experiment/tokenhmr_release.yaml` TRANSFORMER_DECODER."""

    dim: int = 1024
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 1024
    context_dim: int = 1280
    num_tokens: int = 1
    token_dim: int = 1
    emb_dropout_type: str = "drop"   # drop | zero | normal
    emb_dropout: float = 0.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # "int8": W8A8 path for the cross-attn kv projection over the (B, S,
    # 1280) backbone context — the only head matmul with a large row count
    # (everything else runs at N=1 query tokens).  Inference only.
    quant: str | None = None


class _SelfAttention(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.cfg
        inner = c.heads * c.dim_head
        B, N, _ = x.shape
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=c.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shp = (B, N, c.heads, c.dim_head)
        q, k, v = (t.reshape(shp).transpose(0, 2, 1, 3) for t in (q, k, v))
        o = mha(q, k, v, scale=c.dim_head ** -0.5, impl="xla")
        o = o.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return nn.Dense(c.dim, dtype=c.dtype, name="to_out")(o)


class _CrossAttention(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, context, deterministic=True, context_bias=None):
        c = self.cfg
        inner = c.heads * c.dim_head
        B, N, _ = x.shape
        T = context.shape[1]
        if c.quant == "int8":
            # QDense only reads .quant/.dtype from its cfg and creates the
            # identical {"kernel"} param tree as nn.Dense
            from .vit import QDense
            kv = QDense(inner * 2, c, use_bias=False, name="to_kv")(context)
        else:
            kv = nn.Dense(inner * 2, use_bias=False, dtype=c.dtype,
                          name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        q = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="to_q")(x)
        q = q.reshape(B, N, c.heads, c.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, c.heads, c.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, c.heads, c.dim_head).transpose(0, 2, 1, 3)
        o = mha(q, k, v, scale=c.dim_head ** -0.5, impl="xla", bias=context_bias)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return nn.Dense(c.dim, dtype=c.dtype, name="to_out")(o)


class _FeedForward(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.cfg
        h = nn.Dense(c.mlp_dim, dtype=c.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.Dense(c.dim, dtype=c.dtype, name="fc2")(h)
        return nn.Dropout(c.dropout)(h, deterministic=deterministic)


class TransformerCrossAttn(nn.Module):
    """depth x {prenorm self-attn, prenorm cross-attn, prenorm FFN}
    (ref pose_transformer.py:160-201)."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, context, deterministic=True, context_bias=None):
        c = self.cfg
        for i in range(c.depth):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"sa_norm{i}")(x).astype(c.dtype)
            x = x + _SelfAttention(c, name=f"sa{i}")(h, deterministic)
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"ca_norm{i}")(x).astype(c.dtype)
            x = x + _CrossAttention(c, name=f"ca{i}")(h, context, deterministic,
                                                      context_bias=context_bias)
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"ff_norm{i}")(x).astype(c.dtype)
            x = x + _FeedForward(c, name=f"ff{i}")(h, deterministic)
        return x


class TransformerDecoder(nn.Module):
    """Token embed + pos embed + cross-attn stack (ref pose_transformer.py:295-357).

    Query-token dropout (Drop/Zero variants, ref :204-238) is applied when
    train=True; at num_tokens=1 the released configs set it to 0.
    """

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, inp, context, train: bool = False, context_bias=None):
        c = self.cfg
        x = nn.Dense(c.dim, dtype=c.dtype, name="to_token_embedding")(inp)
        B, N, _ = x.shape
        if train and c.emb_dropout > 0.0:
            rng = self.make_rng("dropout")
            if c.emb_dropout_type == "zero":
                mask = jax.random.bernoulli(rng, c.emb_dropout, (B, N, 1))
                x = jnp.where(mask, 0.0, x)
            else:  # "drop"/"normal" degrade to standard dropout in fixed-shape JAX
                x = nn.Dropout(c.emb_dropout, deterministic=False)(x)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, c.num_tokens, c.dim),
            jnp.float32,
        )
        x = x + pos[:, :N].astype(x.dtype)
        return TransformerCrossAttn(c, name="transformer")(
            x, context, not train, context_bias=context_bias)
