"""Cross-attention transformer decoder for the SMPL head.

Capabilities of ref `tokenhmr/lib/models/components/pose_transformer.py`:
pre-norm TransformerCrossAttn (self-attn, cross-attn over backbone tokens,
FFN), learned query pos-embed, token-dropout variants.  Query length is 1
in TokenHMR, context is the 192 ViT tokens.

The conditional-MLP machinery of `t_cond_mlp.py` (AdaptiveLayerNorm1D
:7-33, ResidualMLP :139-177, FrequencyEmbedder :180-198) is provided here
as `norm="ada"` + `AdaptiveLayerNorm`/`ResidualMLP`/`frequency_embed`.
TokenHMR's released configs use plain LayerNorm (`norm: layer`), so the
default path never pays for it — the conditional branch only materializes
when `DecoderConfig.norm == "ada"`.
"""
from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha
from ..parallel.mesh import constrain_batch


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
    # "layer" (released configs) or "ada": FiLM-conditioned LayerNorm
    # (ref t_cond_mlp.py:7-33 via pose_transformer.py `norm` option).
    # "ada" requires a `norm_cond` (B, norm_cond_dim) argument.
    norm: str = "layer"
    norm_cond_dim: int = -1


class AdaptiveLayerNorm(nn.Module):
    """FiLM-style conditional LayerNorm (ref t_cond_mlp.py:7-33).

    `x` is layer-normalized (learned affine, like the torch default), then
    scaled/shifted by `(1 + alpha, beta)` predicted from the condition by a
    zeros-initialized linear — at init this IS plain LayerNorm, matching the
    torch `init.zeros_` on both weight and bias.
    """

    dim: int
    cond_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        ab = nn.Dense(2 * self.dim, dtype=jnp.float32,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="linear")(
            cond.astype(jnp.float32))
        alpha, beta = jnp.split(ab, 2, axis=-1)
        # broadcast (B, dim) over any middle axes of x, e.g. (B, N, dim)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.dim,)
        out = h * (1.0 + alpha.reshape(shape)) + beta.reshape(shape)
        return out.astype(self.dtype)


def frequency_embed(x: jax.Array, num_frequencies: int,
                    max_freq_log2: float) -> jax.Array:
    """NeRF-style sin/cos embedding (ref t_cond_mlp.py:180-198).

    x: (N,) or (N, D) -> (N, D * (2*num_frequencies + 1)).
    """
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    freqs = 2.0 ** jnp.linspace(0.0, max_freq_log2, num_frequencies)
    scaled = x[..., None] * freqs  # (N, D, F)
    return jnp.concatenate(
        [jnp.sin(scaled), jnp.cos(scaled), x[..., None]], axis=-1
    ).reshape(n, -1)


class ResidualMLP(nn.Module):
    """linear+norm+act stem, residual hidden blocks, linear readout
    (ref t_cond_mlp.py:104-177).  norm="ada" threads `cond` through every
    normalization layer, exactly like SequentialCond does in torch."""

    hidden_dim: int
    num_hidden_layers: int
    output_dim: int
    num_blocks: int = 1
    norm: str = "layer"
    norm_cond_dim: int = -1
    dtype: jnp.dtype = jnp.float32

    def _norm(self, x, cond, name):
        if self.norm == "ada":
            return AdaptiveLayerNorm(self.hidden_dim, self.norm_cond_dim,
                                     self.dtype, name=name)(x, cond)
        if self.norm == "layer":
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                name=name)(x).astype(self.dtype)
        raise ValueError(f"unknown norm {self.norm!r}")

    @nn.compact
    def __call__(self, x, cond=None):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="stem")(x)
        x = nn.relu(self._norm(x, cond, "stem_norm"))
        for b in range(self.num_blocks):
            h = x
            for i in range(self.num_hidden_layers):
                h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                             name=f"block{b}_fc{i}")(h)
                h = nn.relu(self._norm(h, cond, f"block{b}_norm{i}"))
            x = x + h
        return nn.Dense(self.output_dim, dtype=self.dtype, name="out")(x)


class _SelfAttention(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.cfg
        inner = c.heads * c.dim_head
        B, N, _ = x.shape
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=c.dtype, name="to_qkv")(x)
        qkv = constrain_batch(qkv)
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
        kv = constrain_batch(kv)
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

    def _norm(self, x, norm_cond, name):
        c = self.cfg
        if c.norm == "ada":
            assert norm_cond is not None, 'norm="ada" needs norm_cond'
            return AdaptiveLayerNorm(c.dim, c.norm_cond_dim, c.dtype,
                                     name=name)(x, norm_cond)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name=name)(x).astype(c.dtype)

    @nn.compact
    def __call__(self, x, context, deterministic=True, context_bias=None,
                 norm_cond=None):
        c = self.cfg
        for i in range(c.depth):
            h = self._norm(x, norm_cond, f"sa_norm{i}")
            x = x + _SelfAttention(c, name=f"sa{i}")(h, deterministic)
            h = self._norm(x, norm_cond, f"ca_norm{i}")
            x = x + _CrossAttention(c, name=f"ca{i}")(h, context, deterministic,
                                                      context_bias=context_bias)
            h = self._norm(x, norm_cond, f"ff_norm{i}")
            x = x + _FeedForward(c, name=f"ff{i}")(h, deterministic)
        return x


class TransformerSelfAttn(nn.Module):
    """Self-attention-only stack: depth x {prenorm self-attn, prenorm FFN}
    (ref pose_transformer.py:127-158 `Transformer`).  Supports norm="ada"
    via `norm_cond` like the cross-attn stack."""

    cfg: DecoderConfig

    def _norm(self, x, norm_cond, name):
        c = self.cfg
        if c.norm == "ada":
            assert norm_cond is not None, 'norm="ada" needs norm_cond'
            return AdaptiveLayerNorm(c.dim, c.norm_cond_dim, c.dtype,
                                     name=name)(x, norm_cond)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name=name)(x).astype(c.dtype)

    @nn.compact
    def __call__(self, x, deterministic=True, norm_cond=None):
        c = self.cfg
        for i in range(c.depth):
            h = self._norm(x, norm_cond, f"sa_norm{i}")
            x = x + _SelfAttention(c, name=f"sa{i}")(h, deterministic)
            h = self._norm(x, norm_cond, f"ff_norm{i}")
            x = x + _FeedForward(c, name=f"ff{i}")(h, deterministic)
        return x


class TransformerEncoder(nn.Module):
    """Token embed + pos embed + self-attn stack (ref
    pose_transformer.py:241-298).  `token_pe_numfreq > 0` frequency-embeds
    each input token before the linear embedding, exactly like the
    reference's Rearrange+FrequencyEmbedder pipeline."""

    cfg: DecoderConfig
    token_pe_numfreq: int = -1

    @nn.compact
    def __call__(self, inp, train: bool = False, norm_cond=None):
        c = self.cfg
        if self.token_pe_numfreq > 0:
            B, N, D = inp.shape
            emb = frequency_embed(
                inp.reshape(B * N, D), self.token_pe_numfreq,
                float(self.token_pe_numfreq - 1))
            x = nn.Dense(c.dim, dtype=c.dtype, name="to_token_embedding")(
                emb.reshape(B, N, -1))
        else:
            x = nn.Dense(c.dim, dtype=c.dtype, name="to_token_embedding")(inp)
        B, N, _ = x.shape
        if train and c.emb_dropout > 0.0:
            rng = self.make_rng("dropout")
            if c.emb_dropout_type == "zero":
                mask = jax.random.bernoulli(rng, c.emb_dropout, (B, N, 1))
                x = jnp.where(mask, 0.0, x)
            else:
                x = nn.Dropout(c.emb_dropout, deterministic=False)(x)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, c.num_tokens, c.dim),
            jnp.float32,
        )
        x = x + pos[:, :N].astype(x.dtype)
        return TransformerSelfAttn(c, name="transformer")(
            x, not train, norm_cond=norm_cond)


class TransformerDecoder(nn.Module):
    """Token embed + pos embed + cross-attn stack (ref pose_transformer.py:295-357).

    Query-token dropout (Drop/Zero variants, ref :204-238) is applied when
    train=True; at num_tokens=1 the released configs set it to 0.
    """

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, inp, context, train: bool = False, context_bias=None,
                 norm_cond=None):
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
            x, context, not train, context_bias=context_bias,
            norm_cond=norm_cond)
