"""ViT-H backbone (ViTPose/HMR2-style) in flax, TPU-first.

Capabilities of ref `tokenhmr/lib/models/backbones/vit.py`: 256x192 crops ->
overlapping 16x16 patch embed (pad 4) -> +abs pos embed -> 32 pre-norm
blocks (16 heads, mlp x4, stochastic depth 0.55) -> final LayerNorm.

TPU-native differences:
  * NHWC layout, tokens stay (B, S, C) throughout (the reference reshapes
    to NCHW feature maps at the end, `vit.py:337`, only for the head to
    immediately rearrange back, `token_head.py:69`; we skip the round trip)
  * attention runs through the fused Pallas kernel on TPU (ops/attention.py)
  * bf16 activations with fp32 params and fp32 LayerNorms
  * 256x256 -> width-slice [:, :, 32:-32] (ref `vit.py:342`) is provided as
    `slice_to_vit_aspect` for callers that feed square crops.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import (mha_packed, mha_packed_bias, mha_packed_q8,
                             mha_packed_xla)
from ..ops.merge import merge_tokens
from ..ops.qmatmul import int8_dense, ln_quant


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """ViT-H/16 as used by TokenHMR (ref `vit.py:12-24`)."""

    img_size: Tuple[int, int] = (256, 192)   # (H, W) after slicing
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.55
    dtype: jnp.dtype = jnp.bfloat16          # activation dtype
    attn_impl: str = "auto"                  # auto | pallas | xla
    remat: bool = False                      # jax.checkpoint each block
    scan_blocks: bool = True                 # lax.scan over the 32 blocks
    # scan unroll factor (1 = rolled loop).  The rolled loop double-buffers
    # the (B, S, C) carry — a measured ~2.5 ms/step copy tax at B=128
    # (docs/PERF_NOTES.md); unrolling N iterations amortizes it N-fold at
    # the cost of an N-times-larger loop body to compile.  True = full
    # unroll (inference: kills the carry copy entirely).
    scan_unroll: int = 1
    ln_dtype: jnp.dtype = jnp.float32        # LayerNorm compute dtype
    # tanh-approx GELU: the exact erf lowers to a ~300-op f32 polynomial on
    # the (B,S,5120) MLP hidden (measured ~2x MLP-fusion bloat on v5e);
    # approx error ~1e-3 relative.  Set False for bit-strict torch parity.
    gelu_approx: bool = True
    # "int8": W8A8 dynamic quant for qkv/proj/fc1/fc2 (inference only; the
    # int8 MXU path is 1.5-1.7x bf16 on v5e — see ops/qmatmul.py).  None =
    # bf16 matmuls (training + bit-accurate parity path).  "calib": bf16
    # forward that records per-channel activation maxima into a mutable
    # "quant" collection (apply with mutable=["quant"]); feed the result
    # back as the "quant" collection with quant="int8" to enable the
    # static-scale fc1->fc2 path.
    quant: str | None = None
    # ToMe token merging (ops/merge.py), inference only: ((block, r), ...)
    # means "merge r tokens immediately BEFORE running `block`".  Entries
    # must be in increasing block order.  E.g. ((8, 32), (16, 32), (24, 32))
    # runs blocks 0-7 at 192 tokens, 8-15 at 160, 16-23 at 128, 24-31 at 96.
    # () = exact reference compute graph.  Use through `vit_apply`.
    merge_schedule: Tuple[Tuple[int, int], ...] = ()
    # proportional attention over merged tokens (log-size key bias)
    merge_prop_attn: bool = True
    # similarity features for bipartite matching: "keys" = the upcoming
    # block's attention keys, head-mean (the ToMe paper's metric — one
    # extra (S,C)@(C,C) matmul per merge site, ~0.1% of total FLOPs);
    # "x" = raw block input (round-2 behavior, kept for A/B)
    merge_metric: str = "keys"

    @property
    def grid_hw(self) -> Tuple[int, int]:
        # conv pad 4: H' = (H + 8 - 16)//16 + 1
        return (
            (self.img_size[0] + 8 - self.patch_size) // self.patch_size + 1,
            (self.img_size[1] + 8 - self.patch_size) // self.patch_size + 1,
        )

    @property
    def num_patches(self) -> int:
        h, w = self.grid_hw
        return h * w


def slice_to_vit_aspect(x: jax.Array) -> jax.Array:
    """(B, S, S, 3) -> (B, S, 3S/4, 3) center width slice.

    At S=256 this is exactly the reference's x[:, :, 32:-32] (ref vit.py:342);
    expressed proportionally (S/8 per side) so tiny test configs work too.
    """
    cut = x.shape[2] // 8
    return x[:, :, cut:-cut, :]


class DropPath(nn.Module):
    """Per-sample stochastic depth (ref vit.py:59-69)."""

    rate: float
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("drop_path")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class QDense(nn.Module):
    """nn.Dense-compatible layer (same param names/init/tree) that runs the
    W8A8 int8 MXU path when `quant == "int8"`, with an optional activation
    fused into the dequant epilogue.  Falls back to an exact nn.Dense-style
    bf16 matmul when quant is None."""

    features: int
    cfg: ViTConfig
    use_bias: bool = True
    act: str | None = None  # None | "gelu" | "gelu_tanh", fused when quantized

    @nn.compact
    def __call__(self, x, residual=None, x_prequant=None, in_scale=None,
                 quant_out_scale=None, calib_in_scale=None, raw=False):
        """x_prequant: (int8, row-scales-or-None) from a producer kernel that
        already quantized (skips the quant pass); residual: fused
        `out + residual`; in_scale/quant_out_scale: static per-channel
        scales (see ops/qmatmul.int8_dense).  calib_in_scale: in calib mode,
        fold these producer scales into the recorded weight quantization
        (the consumer will then pass x_prequant with a None scale and no
        in_scale — the fold is baked into w_q/w_s)."""
        c = self.cfg
        in_features = (x_prequant[0] if x_prequant is not None else x).shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        if c.quant == "calib":
            # record pre-quantized weights once (per-channel int8 + scales)
            # so inference skips the per-step quantize_cols pass
            from ..ops.qmatmul import quantize_cols
            w = kernel.astype(jnp.float32)
            if calib_in_scale is not None:
                w = w * calib_in_scale.reshape(in_features, 1)
            wq_c, ws_c = quantize_cols(w)
            self.variable("quant", "w_q",
                          lambda: jnp.zeros(w.shape, jnp.int8)).value = wq_c
            self.variable("quant", "w_s",
                          lambda: jnp.ones((1, self.features), jnp.float32)
                          ).value = ws_c
        if c.quant == "int8":
            w_prequant = None
            if self.has_variable("quant", "w_q"):
                w_prequant = (
                    self.variable("quant", "w_q", lambda: None).value,
                    self.variable("quant", "w_s", lambda: None).value,
                )
                in_scale = None  # fold already baked into w_q/w_s
            if raw:
                # caller runs its own fused kernel (qkv+attention) — just
                # create/fetch the params and hand back the raw pieces
                return kernel, bias, w_prequant
            return int8_dense(x, kernel, bias, act=self.act, out_dtype=c.dtype,
                              residual=residual, x_prequant=x_prequant,
                              in_scale=in_scale,
                              quant_out_scale=quant_out_scale,
                              w_prequant=w_prequant)
        y = jnp.dot(x, kernel.astype(c.dtype))
        if bias is not None:
            y = y + bias.astype(c.dtype)
        if self.act is not None:
            y = jax.nn.gelu(y, approximate=self.act == "gelu_tanh")
        if residual is not None:
            y = y + residual
        return y


class QLayerNorm(nn.Module):
    """nn.LayerNorm-compatible (same param names 'scale'/'bias', same math)
    that can emit (int8, row-scales) via the fused ln_quant Pallas kernel."""

    cfg: ViTConfig
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, quantize: bool = False, raw_params: bool = False):
        c = self.cfg
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        if raw_params:
            # caller folds the LN into its own fused kernel
            return gamma, beta
        if quantize:
            return ln_quant(x, gamma, beta, self.eps)
        xf = x.astype(c.ln_dtype)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma.astype(c.ln_dtype) + beta.astype(c.ln_dtype)
                ).astype(c.dtype)


class ViTAttention(nn.Module):
    """qkv -> fused attention -> proj (ref vit.py:89-126)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, residual=None, x_prequant=None, attn_bias=None,
                 ln_raw=None):
        c = self.cfg
        head_dim = c.embed_dim // c.num_heads
        scale = head_dim ** -0.5
        impl = c.attn_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        import os as _os
        if ln_raw is not None:
            # ln_raw = (raw x, gamma, beta): the producer LayerNorm is
            # folded into the fused kernel too (ops/attention.py:
            # ln_qkv_mha_q8) — neither the LN output nor the qkv tensor
            # ever exists in HBM
            assert impl == "pallas" and c.quant == "int8"
            return self._fused_qkv_attention(None, residual, attn_bias,
                                             scale, ln_raw=ln_raw)
        if (impl == "pallas" and c.quant == "int8"
                and x_prequant is not None and x_prequant[1] is not None
                and _os.environ.get("THMR_FUSED_QKV", "1") == "1"):
            # default ON: measured 1368 vs 1181 crops/s e2e at the default
            # merge schedule (THMR_FUSED_QKV=0 restores separate kernels)
            # qkv matmul + attention + int8-out in ONE pallas kernel — the
            # (B, S, 3HD) qkv tensor never round-trips HBM
            # (ops/attention.py:qkv_mha_q8); needs the ln_quant producer
            # (int8 x + per-row scales)
            return self._fused_qkv_attention(x_prequant, residual,
                                             attn_bias, scale)
        qkv = QDense(3 * c.embed_dim, c, use_bias=c.qkv_bias, name="qkv")(
            x, x_prequant=x_prequant)
        if impl == "pallas":
            if c.quant == "int8":
                # int8-out epilogue: the per-token quant for proj happens in
                # the attention kernel's VMEM, not as a separate HBM pass
                oq, os_ = mha_packed_q8(qkv, scale, c.num_heads, bias=attn_bias)
                return QDense(c.embed_dim, c, name="proj")(
                    None, residual=residual, x_prequant=(oq, os_))
            if attn_bias is not None:
                o = mha_packed_bias(qkv, attn_bias, scale, c.num_heads)
            else:
                o = mha_packed(qkv, scale, c.num_heads)  # transpose-free kernel
        else:
            o = mha_packed_xla(qkv, scale, c.num_heads, bias=attn_bias)
        return QDense(c.embed_dim, c, name="proj")(o, residual=residual)

    def _fused_qkv_attention(self, x_prequant, residual, attn_bias, scale,
                             ln_raw=None):
        c = self.cfg
        from ..ops.attention import ln_qkv_mha_q8, qkv_mha_q8
        shape_src = ln_raw[0] if ln_raw is not None else x_prequant
        kernel, bias, w_pq = QDense(
            3 * c.embed_dim, c, use_bias=c.qkv_bias, name="qkv")(
            None, x_prequant=(shape_src if ln_raw is None
                              else (ln_raw[0], None)), raw=True)
        if w_pq is not None:
            wq, ws = w_pq
        else:  # uncalibrated fallback: quantize per call (XLA folds it)
            from ..ops.qmatmul import quantize_cols
            wq, ws = quantize_cols(kernel.astype(jnp.float32))
        if bias is None:
            bias = jnp.zeros((3 * c.embed_dim,), jnp.float32)
        if ln_raw is not None:
            xr, gamma, beta = ln_raw
            import os as _os
            S = xr.shape[1]
            if (S <= 160 and residual is not None
                    and _os.environ.get("THMR_FUSED_PROJ", "0") == "1"):
                # whole attention half-block in one kernel (+proj+residual);
                # the (H, S, S) scores scratch + both resident weights only
                # fit VMEM at merged sequence lengths
                from ..ops.attention import attn_block_q8
                from ..ops.qmatmul import quantize_cols
                pk, pb, p_pq = QDense(c.embed_dim, c, name="proj")(
                    None, x_prequant=(jnp.zeros((1, c.embed_dim)), None),
                    raw=True)
                if p_pq is not None:
                    wqp, wsp = p_pq
                else:
                    wqp, wsp = quantize_cols(pk.astype(jnp.float32))
                if pb is None:
                    pb = jnp.zeros((c.embed_dim,), jnp.float32)
                return attn_block_q8(
                    xr, gamma, beta, wq, ws.reshape(-1), bias,
                    wqp, wsp.reshape(-1), pb, residual,
                    scale, c.num_heads, attn_bias=attn_bias)
            oq, os_ = ln_qkv_mha_q8(
                xr, gamma, beta, wq, ws.reshape(-1), bias,
                scale, c.num_heads, attn_bias=attn_bias)
        else:
            oq, os_ = qkv_mha_q8(
                x_prequant[0], x_prequant[1], wq, ws.reshape(-1), bias,
                scale, c.num_heads, attn_bias=attn_bias)
        return QDense(c.embed_dim, c, name="proj")(
            None, residual=residual, x_prequant=(oq, os_))


class ViTMlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, residual=None, x_prequant=None, ln_raw=None):
        c = self.cfg
        act = "gelu_tanh" if c.gelu_approx else "gelu"
        hidden = int(c.embed_dim * c.mlp_ratio)
        static = c.quant == "int8" and self.has_variable("quant", "fc1_out_scale")
        if ln_raw is not None and not static:
            # LN-fusion requested but no calibrated scales (dynamic int8
            # run): compute the LN here and take the standard path
            xr, gamma, beta = ln_raw
            xf = xr.astype(c.ln_dtype)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
            x = (y * gamma.astype(c.ln_dtype) + beta.astype(c.ln_dtype)
                 ).astype(c.dtype)
            ln_raw = None
        if static:
            # static per-channel quantization of the fc1->fc2 intermediate
            # (calibrated, see ViTConfig.quant="calib"): fc1 emits int8
            # directly (XLA fuses /scale+round+cast into the matmul
            # epilogue — the bf16 (B,S,4C) tensor never exists in HBM) and
            # the scales fold into fc2's weight quant, SmoothQuant-style
            s = self.variable("quant", "fc1_out_scale",
                              lambda: jnp.ones((hidden,), jnp.float32)).value
            import os as _os
            if (ln_raw is None and x_prequant is not None
                    and x_prequant[1] is not None and residual is not None
                    and jax.default_backend() == "tpu"
                    and _os.environ.get("THMR_FUSED_MLP", "0") == "1"):
                # whole MLP in ONE kernel, hidden K-chunked over the grid
                # (never in HBM) — ROADMAP perf #2, measured via bench A/B
                from ..ops.qmatmul import fused_mlp_q8, quantize_cols
                k1, b1, w1pq = QDense(hidden, c, act=act, name="fc1")(
                    None, x_prequant=(x_prequant[0], None), raw=True)
                k2, b2, w2pq = QDense(c.embed_dim, c, name="fc2")(
                    None, x_prequant=(jnp.zeros((1, hidden)), None), raw=True)
                w1q, w1s = (w1pq if w1pq is not None
                            else quantize_cols(k1.astype(jnp.float32)))
                w2q, w2s = (w2pq if w2pq is not None
                            else quantize_cols(
                                k2.astype(jnp.float32)
                                * s.reshape(hidden, 1)))
                if b1 is None:
                    b1 = jnp.zeros((hidden,), jnp.float32)
                if b2 is None:
                    b2 = jnp.zeros((c.embed_dim,), jnp.float32)
                xq, xs = x_prequant
                B_, S_, K_ = xq.shape
                out = fused_mlp_q8(
                    xq.reshape(B_ * S_, K_), xs.reshape(B_ * S_, 1),
                    w1q, w1s.reshape(-1), b1, s,
                    w2q, w2s.reshape(-1), b2,
                    residual.reshape(B_ * S_, K_), act=act,
                    out_dtype=c.dtype)
                return out.reshape(residual.shape)
            if ln_raw is not None:
                # norm2 folded into the fc1 kernel too (ops/qmatmul.py:
                # ln_int8_matmul_q8) — LN output/int8 never in HBM
                from ..ops.qmatmul import ln_int8_matmul_q8, quantize_cols
                kernel, bias, w_pq = QDense(hidden, c, act=act, name="fc1")(
                    None, x_prequant=(ln_raw[0], None), raw=True)
                if w_pq is not None:
                    wq, ws = w_pq
                else:
                    wq, ws = quantize_cols(kernel.astype(jnp.float32))
                if bias is None:
                    bias = jnp.zeros((hidden,), jnp.float32)
                hq = ln_int8_matmul_q8(
                    ln_raw[0], ln_raw[1], ln_raw[2], wq, ws.reshape(-1),
                    bias, s, act=act)
            else:
                hq = QDense(hidden, c, act=act, name="fc1")(
                    x, x_prequant=x_prequant, quant_out_scale=s)
            return QDense(c.embed_dim, c, name="fc2")(
                None, residual=residual, x_prequant=(hq, None), in_scale=s)
        h = QDense(hidden, c, act=act, name="fc1")(x, x_prequant=x_prequant)
        fc2_calib_scale = None
        if c.quant == "calib":
            # calibration pass: record per-channel max |fc1 output| for the
            # static-quant inference path (run with mutable=["quant"])
            stat = self.variable("quant", "fc1_out_scale",
                                 lambda: jnp.ones((hidden,), jnp.float32))
            amax = jnp.max(jnp.abs(h.astype(jnp.float32)),
                           axis=tuple(range(h.ndim - 1)))
            # 10% headroom over the calibration batch, folded here so the
            # fc2 weight fold below sees the SAME scales inference will use
            stat.value = jnp.maximum(amax, 1e-6) * 1.1 / 127.0
            # fold the fc1 output scales into fc2's recorded weight quant
            # (inference then runs the static x_prequant path, scale-free)
            fc2_calib_scale = stat.value
        return QDense(c.embed_dim, c, name="fc2")(
            h, residual=residual, calib_in_scale=fc2_calib_scale)


class ViTBlock(nn.Module):
    cfg: ViTConfig
    drop_path: float
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dp = lambda name: DropPath(self.drop_path, self.deterministic, name=name)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(c.dtype)
        x = x + dp("dp1")(ViTAttention(c, name="attn")(h))
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(c.dtype)
        x = x + dp("dp2")(ViTMlp(c, name="mlp")(h))
        return x


class _ScanViTBlock(nn.Module):
    """Scan body: same math as ViTBlock, drop-path rate as a scanned input.

    Compiling ONE block that lax.scan iterates 32 times cuts XLA compile
    time/HLO size by ~depth x vs unrolling (identical runtime math; the
    per-block matmuls are far too large for cross-layer fusion to matter).
    """

    cfg: ViTConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, dp_rate, attn_bias=None):
        c = self.cfg
        # fused-residual path: with deterministic drop-path (identity), the
        # residual add rides the proj/fc2 matmul epilogues instead of being
        # a separate (B,S,C) HBM pass; on TPU the LayerNorms additionally
        # emit int8 + row scales directly (fused ln_quant kernel)
        fuse = c.quant == "int8" and self.deterministic
        qln = fuse and jax.default_backend() == "tpu"
        import os as _os
        # default ON: 1388 vs 1368 crops/s e2e (THMR_FUSED_LN=0 reverts)
        fuse_ln = (qln and c.attn_impl in ("auto", "pallas")
                   and _os.environ.get("THMR_FUSED_LN", "1") == "1")
        if fuse_ln:
            # norm1 + quant + qkv + attention + int8-out in ONE kernel
            gamma, beta = QLayerNorm(c, name="norm1")(x, raw_params=True)
            x = ViTAttention(c, name="attn")(None, residual=x,
                                             ln_raw=(x, gamma, beta),
                                             attn_bias=attn_bias)
        else:
            h = QLayerNorm(c, name="norm1")(x, quantize=qln)
            if fuse:
                if qln:
                    x = ViTAttention(c, name="attn")(None, residual=x,
                                                     x_prequant=h,
                                                     attn_bias=attn_bias)
                else:
                    x = ViTAttention(c, name="attn")(h, residual=x,
                                                     attn_bias=attn_bias)
            else:
                h = ViTAttention(c, name="attn")(h, attn_bias=attn_bias)
                x = x + _traced_drop_path(self, h, dp_rate)
        fuse_ln_mlp = (fuse_ln
                       and _os.environ.get("THMR_FUSED_LN_MLP", "0") == "1")
        if fuse_ln_mlp:
            gamma2, beta2 = QLayerNorm(c, name="norm2")(x, raw_params=True)
            return ViTMlp(c, name="mlp")(None, residual=x,
                                         ln_raw=(x, gamma2, beta2)), None
        h = QLayerNorm(c, name="norm2")(x, quantize=qln)
        if fuse:
            if qln:
                x = ViTMlp(c, name="mlp")(None, residual=x, x_prequant=h)
            else:
                x = ViTMlp(c, name="mlp")(h, residual=x)
        else:
            h = ViTMlp(c, name="mlp")(h)
            x = x + _traced_drop_path(self, h, dp_rate)
        return x, None


def _traced_drop_path(mod: nn.Module, x, rate):
    if mod.deterministic:
        return x
    keep = 1.0 - rate
    rng = mod.make_rng("drop_path")
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    # keep is a traced f32; divide in x.dtype so the scan carry dtype is
    # stable (bf16 activations would otherwise promote to f32)
    scaled = x / keep.astype(x.dtype)
    return jnp.where(mask, scaled, jnp.zeros_like(x))


class ViT(nn.Module):
    """(B, 256, 192, 3) normalized crop -> (B, 192, 1280) fp32 tokens."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        if x.shape[1] == x.shape[2]:  # square input: apply the ref width slice
            x = slice_to_vit_aspect(x)
        x = nn.Conv(
            c.embed_dim,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding=[(4, 4), (4, 4)],
            dtype=c.dtype,
            name="patch_embed",
        )(x.astype(c.dtype))
        B, Hp, Wp, C = x.shape
        x = x.reshape(B, Hp * Wp, C)

        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, c.num_patches + 1, c.embed_dim),
            jnp.float32,
        )
        # ref vit.py:324-327: add patch pos embeds + the (sin-cos zero) cls slot
        x = x + (pos[:, 1:] + pos[:, :1]).astype(c.dtype)

        dpr = np.linspace(0, c.drop_path_rate, c.depth)
        if c.scan_blocks:
            body = _ScanViTBlock
            if c.remat:
                body = nn.remat(body, static_argnums=())
            scan = nn.scan(
                body,
                variable_axes={"params": 0, "quant": 0},
                split_rngs={"params": True, "drop_path": True},
                in_axes=0,
                length=c.depth,
                unroll=c.scan_unroll,
            )
            x, _ = scan(c, deterministic=not train, name="blocks")(
                x, jnp.asarray(dpr, jnp.float32)
            )
        else:
            block_ctor = ViTBlock
            if c.remat:
                block_ctor = nn.remat(ViTBlock, static_argnums=())
            for i in range(c.depth):
                x = block_ctor(c, float(dpr[i]), deterministic=not train,
                               name=f"block{i}")(x)

        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="last_norm")(x)
        return x.astype(jnp.float32)  # (B, S, C) tokens, h-major order


def _patch_embed_module(c: ViTConfig) -> nn.Conv:
    return nn.Conv(
        c.embed_dim,
        kernel_size=(c.patch_size, c.patch_size),
        strides=(c.patch_size, c.patch_size),
        padding=[(4, 4), (4, 4)],
        dtype=c.dtype,
        name="patch_embed",
    )


def vit_apply(cfg: ViTConfig, variables, x, train: bool = False, rngs=None):
    """Backbone forward returning (tokens, sizes).

    With an empty merge_schedule (or in training) this is exactly
    `ViT(cfg).apply(...)` and sizes is None.  With a merge schedule it runs
    the token-merging inference path: sizes (B, S_final) counts how many
    original patches each surviving token represents (feed log(sizes) to
    downstream cross-attention as a key bias).
    """
    if train or not cfg.merge_schedule:
        return ViT(cfg).apply(variables, x, train=train, rngs=rngs), None
    assert cfg.scan_blocks, "token merging requires the scanned-blocks layout"
    return _vit_forward_merged(cfg, variables, x)


def _merge_metric_keys(c: ViTConfig, block_params, k: int, x: jax.Array):
    """ToMe matching metric: attention keys of the block the merged tokens
    are about to enter, averaged over heads (Bolya et al. match on keys;
    their ablations show raw hidden states degrade more).

    Merging here happens BETWEEN blocks (the reference merges inside the
    block after its attention), so the closest analogue is the upcoming
    block `k`'s keys: K = LN(x; norm1) @ W_k + b_k, head-mean -> (B, S, D).
    """
    g = block_params["norm1"]["scale"][k].astype(jnp.float32)
    b = block_params["norm1"]["bias"][k].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    h = ((xf - mean) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(c.dtype)

    C = c.embed_dim
    wk = block_params["attn"]["qkv"]["kernel"][k][:, C:2 * C].astype(c.dtype)
    keys = jnp.dot(h, wk)
    qkv_p = block_params["attn"]["qkv"]
    if "bias" in qkv_p:
        keys = keys + qkv_p["bias"][k][C:2 * C].astype(c.dtype)
    B, S, _ = keys.shape
    D = C // c.num_heads
    return keys.reshape(B, S, c.num_heads, D).mean(axis=2)


def _vit_forward_merged(cfg: ViTConfig, variables, x):
    """Segmented ViT forward with ToMe token merging between segments.

    Reuses the exact same parameter tree as ViT (blocks stacked (depth, ...)
    by nn.scan): each segment is a lax.scan over a static slice of the
    stacked block params, and `merge_tokens` (ops/merge.py) shrinks the
    token axis between segments.  Inference only (no drop-path / rngs).
    """
    c = cfg
    params = variables["params"]
    quant = variables.get("quant")

    if x.shape[1] == x.shape[2]:  # square input: apply the ref width slice
        x = slice_to_vit_aspect(x)
    x = _patch_embed_module(c).apply(
        {"params": params["patch_embed"]}, x.astype(c.dtype))
    B, Hp, Wp, C = x.shape
    x = x.reshape(B, Hp * Wp, C)
    pos = params["pos_embed"]
    x = x + (pos[:, 1:] + pos[:, :1]).astype(c.dtype)

    cuts = [k for k, _ in c.merge_schedule]
    assert cuts == sorted(cuts) and all(0 < k < c.depth for k in cuts), (
        f"merge_schedule blocks must be increasing in (0, {c.depth}): {cuts}")
    bounds = [0] + cuts + [c.depth]
    merges = [0] + [r for _, r in c.merge_schedule]

    block_params = params["blocks"]
    block_quant = quant["blocks"] if quant is not None else None
    body_mod = _ScanViTBlock(c, deterministic=True)
    take = lambda tree, k0, k1: jax.tree_util.tree_map(
        lambda a: a[k0:k1], tree)

    sizes = None
    for seg, (k0, k1) in enumerate(zip(bounds[:-1], bounds[1:])):
        if merges[seg]:
            metric = (_merge_metric_keys(c, block_params, k0, x)
                      if c.merge_metric == "keys" else None)
            x, sizes = merge_tokens(x, sizes, merges[seg], metric=metric)
        bias = (jnp.log(sizes) if sizes is not None and c.merge_prop_attn
                else None)
        seg_p = take(block_params, k0, k1)
        seg_q = take(block_quant, k0, k1) if block_quant is not None else None

        def body(xc, sl, _bias=bias):
            if seg_q is not None:
                p, q = sl
                vs = {"params": p, "quant": q}
            else:
                (p,) = sl
                vs = {"params": p}
            y, _ = body_mod.apply(vs, xc, jnp.float32(0.0), attn_bias=_bias)
            return y, None

        xs = (seg_p, seg_q) if seg_q is not None else (seg_p,)
        x, _ = jax.lax.scan(body, x, xs, unroll=c.scan_unroll)

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="last_norm")
    x = ln.apply({"params": params["last_norm"]}, x)
    return x.astype(jnp.float32), sizes
