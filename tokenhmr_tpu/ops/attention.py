"""Fused multi-head attention for TPU.

The reference's hot loop is 32 ViT-H blocks of vanilla softmax attention at
seq 192 / 16 heads / head_dim 80 (ref `tokenhmr/lib/models/backbones/
vit.py:89-126`), executed by cuDNN on GPU.  Here:

  * `mha_pallas`: a single-pass Pallas kernel, one grid program per
    (batch, head).  At S=192 the full (S, S) score matrix fits VMEM
    comfortably (147 KB fp32), so no flash-style streaming is needed —
    this is an arithmetic-intensity problem, not a memory one
    (SURVEY.md §5 "long-context ... absent").  QK^T and PV hit the MXU;
    the softmax runs in fp32 on the VPU between them, fused in VMEM so the
    scores never touch HBM.
  * `mha_xla`: reference einsum implementation (always used on CPU tests;
    also the autodiff path — the Pallas kernel defines a custom VJP that
    recomputes probabilities, saving the S×S tensor round-trip to HBM).

`mha()` dispatches on backend.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable everywhere but only lowers on TPU
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def mha_xla(q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None,
            bias: Optional[jax.Array] = None) -> jax.Array:
    """(B, H, S, D), (B, H, T, D), (B, H, T, D) -> (B, H, S, D).

    bias: optional (B, T) additive per-key score bias (e.g. log token sizes
    for ToMe proportional attention), broadcast over heads and queries.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (S, D)
    k = k_ref[0]  # (T, D)
    v = v_ref[0]  # (T, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, T)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _mha_pallas_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    B, H, S, D = q.shape
    T = k.shape[2]
    qf = q.reshape(B * H, S, D)
    kf = k.reshape(B * H, T, D)
    vf = v.reshape(B * H, T, D)
    spec = lambda s1, s2: pl.BlockSpec(
        (1, s1, s2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[spec(S, D), spec(T, D), spec(T, D)],
        out_specs=spec(S, D),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * S * T * D * 2,
            bytes_accessed=(qf.size + kf.size + vf.size * 2) * q.dtype.itemsize,
            transcendentals=B * H * S * T,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mha_pallas(q, k, v, scale):
    return _mha_pallas_fwd_impl(q, k, v, scale)


def _mha_pallas_fwd(q, k, v, scale):
    return _mha_pallas_fwd_impl(q, k, v, scale), (q, k, v)


def _mha_pallas_bwd(scale, res, g):
    """Recompute-probabilities backward (standard softmax-attention VJP)."""
    q, k, v = res
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(scores * scale, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhst,bhsd->bhtd", p, g32)
    dp = jnp.einsum("bhsd,bhtd->bhst", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jnp.einsum("bhst,bhtd->bhsd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhst,bhsd->bhtd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_mha_pallas.defvjp(_mha_pallas_fwd, _mha_pallas_bwd)


# ---------------------------------------------------------------------------
# Packed-QKV path: no (B,H,S,D) transposes.
#
# The qkv projection emits (B, S, 3*H*D); reshaping to (B, S, 3, H, D) is
# free, and BlockSpec index maps slice each (b, h) program's q/k/v tiles
# straight out of that layout — the reference's permute(2,0,3,1,4) data
# movement (ref vit.py:115) never happens.
# ---------------------------------------------------------------------------

def _mha_packed_kernel(*refs, scale: float, num_heads: int, head_dim: int,
                       has_bias: bool = False):
    """One batch row: qkv_ref (1, S, 3*H*D) laid out [q | k | v], each of
    H contiguous D-lane chunks.  Heads unrolled; per-head matmuls are
    static lane slices of VMEM — no HBM transposes anywhere.

    Two-phase schedule: ALL QK^T matmuls first (scores parked in VMEM
    scratch), then softmax+PV per head — keeps the MXU pipeline fed with
    back-to-back independent matmuls instead of alternating with the VPU
    (measured 0.507 vs 0.567 ms/layer at B=128 on v5e).

    Optional bias ref (1, S): additive per-key score bias (ToMe
    proportional attention, log token sizes)."""
    qkv_ref = refs[0]
    bias_ref = refs[1] if has_bias else None
    o_ref = refs[1 + has_bias]
    sc_ref = refs[2 + has_bias]
    HD = num_heads * head_dim
    for h in range(num_heads):
        q = qkv_ref[0, :, h * head_dim:(h + 1) * head_dim]
        k = qkv_ref[0, :, HD + h * head_dim: HD + (h + 1) * head_dim]
        sc_ref[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    for h in range(num_heads):
        s = sc_ref[h] * scale
        if bias_ref is not None:  # per-key additive bias (ToMe log sizes)
            s = s + bias_ref[0]   # (1, S) broadcast over (S, S) rows
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        sc_ref[h] = p / jnp.sum(p, axis=-1, keepdims=True)
    # third phase: ALL PV matmuls back-to-back (separating the VPU softmax
    # from the MXU matmuls measured +4% e2e on the q8 variant; same
    # schedule here)
    for h in range(num_heads):
        v = qkv_ref[0, :, 2 * HD + h * head_dim: 2 * HD + (h + 1) * head_dim]
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = jnp.dot(
            sc_ref[h].astype(qkv_ref.dtype), v,
            preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _mha_packed_kernel_batched(qkv_ref, o_ref, *, scale: float,
                               num_heads: int, head_dim: int):
    """Variant: materialize (H, S, D) once in VMEM, then ONE batched
    dot_general per QK^T / PV instead of H sequential small matmuls."""
    HD = num_heads * head_dim
    S = qkv_ref.shape[1]
    def heads(x):   # (S, HD) -> (H, S, D)
        return x.reshape(S, num_heads, head_dim).transpose(1, 0, 2)
    q = heads(qkv_ref[0, :, :HD])
    k = heads(qkv_ref[0, :, HD:2 * HD])
    v = heads(qkv_ref[0, :, 2 * HD:])
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale                                             # (H, S, S)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )                                                     # (H, S, D)
    o_ref[0] = o.transpose(1, 0, 2).reshape(S, HD).astype(o_ref.dtype)


def _mha_packed_impl(qkv: jax.Array, scale: float, num_heads: int,
                     bias: Optional[jax.Array] = None) -> jax.Array:
    """(B, S, 3*H*D) -> (B, S, H*D).  bias: optional (B, S) per-key bias."""
    B, S, THD = qkv.shape
    HD = THD // 3
    D = HD // num_heads
    import os
    # the batched variant's (S, HD)->(H, S, D) reshape is an unsupported
    # Mosaic shape cast as of jax 0.9 — keep it opt-in for future toolchains
    kernel = (_mha_packed_kernel_batched
              if os.environ.get("THMR_ATTN_BATCHED", "0") == "1"
              and bias is None
              else _mha_packed_kernel)
    scratch = []
    if kernel is _mha_packed_kernel:
        scratch = [pltpu.VMEM((num_heads, S, S), jnp.float32)]
    in_specs = [pl.BlockSpec((1, S, THD), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv]
    kw = dict(scale=scale, num_heads=num_heads, head_dim=D)
    if kernel is _mha_packed_kernel:
        kw["has_bias"] = bias is not None
        if bias is not None:
            # (B, 1, S): a (1, 1, S) block keeps the last-two-dims tiling
            # constraint happy (a 2-D (1, S) block would put 1 in the
            # sublane dim, which Mosaic rejects)
            in_specs.append(pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(bias.astype(jnp.float32)[:, None, :])
    out = pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S, HD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, HD), qkv.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * S * S * D,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
    )(*args)
    return out


# ---------------------------------------------------------------------------
# int8-out variant for the W8A8 inference path: same two-phase attention,
# but the epilogue quantizes the output per token (row max over all heads'
# lanes, which live in this program's VMEM block) and emits int8 + scales.
# The downstream proj matmul consumes them directly — the separate
# bf16->f32 convert + quant pass over the (B,S,HD) output (measured 0.35
# ms/layer at B=128) never touches HBM.
# ---------------------------------------------------------------------------

def _three_phase_attn(col, sc_ref, ob_ref, *, num_heads: int, head_dim: int,
                      scale: float, bias_row, compute_dtype):
    """Shared three-phase attention body: ALL QK^T matmuls, then ALL
    softmaxes (pure VPU, probabilities normalized in place in the scores
    scratch), then ALL PV matmuls back-to-back.  Separating the VPU
    softmax from the MXU matmuls measured +4% e2e vs the per-head
    interleave (docs/PERF_NOTES.md).

    col(lo, hi) yields the (S, hi-lo) lane slice of the packed [q|k|v]
    block; results land in ob_ref (S, H*D) f32."""
    HD = num_heads * head_dim
    for h in range(num_heads):
        q = col(h * head_dim, (h + 1) * head_dim)
        k = col(HD + h * head_dim, HD + (h + 1) * head_dim)
        sc_ref[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    for h in range(num_heads):
        s = sc_ref[h] * scale
        if bias_row is not None:  # per-key bias (ToMe log sizes)
            s = s + bias_row
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        sc_ref[h] = p / jnp.sum(p, axis=-1, keepdims=True)
    for h in range(num_heads):
        v = col(2 * HD + h * head_dim, 2 * HD + (h + 1) * head_dim)
        ob_ref[:, h * head_dim:(h + 1) * head_dim] = jnp.dot(
            sc_ref[h].astype(compute_dtype), v,
            preferred_element_type=jnp.float32)


def _quant_rows_out(o, eps: float = 1e-8):
    """Per-row symmetric int8 quant of a VMEM value: (int8, f32 scales)."""
    rs = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True), eps) / 127.0
    return jnp.clip(jnp.rint(o / rs), -127, 127).astype(jnp.int8), rs


def _ln_quant_rows(xf, gamma_row, beta_row, eps: float):
    """LayerNorm + per-row int8 quant on a (S, K) f32 VMEM value."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma_row + beta_row
    rs = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-8) / 127.0
    return jnp.clip(jnp.rint(y / rs), -127, 127).astype(jnp.int8), rs


def _mha_packed_q8_kernel(*refs, scale: float, num_heads: int, head_dim: int,
                          block_rows: int, has_bias: bool = False):
    qkv_ref = refs[0]
    bias_ref = refs[1] if has_bias else None
    o_ref = refs[1 + has_bias]
    s_ref = refs[2 + has_bias]
    sc_ref = refs[3 + has_bias]
    ob_ref = refs[4 + has_bias]
    HD = num_heads * head_dim
    for b in range(block_rows):
        for h in range(num_heads):
            q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[b, :, HD + h * head_dim: HD + (h + 1) * head_dim]
            sc_ref[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        for h in range(num_heads):
            s = sc_ref[h] * scale
            if bias_ref is not None:  # per-key bias (ToMe log sizes)
                s = s + bias_ref[b]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            # denom folded into the (S, D) output instead of the (S, T)
            # probabilities: D=80 < T=192 elementwise divides per head
            denom = jnp.sum(p, axis=-1, keepdims=True)
            v = qkv_ref[b, :, 2 * HD + h * head_dim: 2 * HD + (h + 1) * head_dim]
            o = jnp.dot(p.astype(qkv_ref.dtype), v,
                        preferred_element_type=jnp.float32)
            ob_ref[:, h * head_dim:(h + 1) * head_dim] = o / denom
        o = ob_ref[:]
        rs = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True), 1e-8) / 127.0
        s_ref[b] = rs
        o_ref[b] = jnp.clip(jnp.rint(o / rs), -127, 127).astype(jnp.int8)


def _mha_packed_q8_kernel3(*refs, scale: float, num_heads: int,
                           head_dim: int, block_rows: int,
                           has_bias: bool = False):
    """Three-phase variant: ALL QK^T matmuls, then ALL softmaxes (VPU,
    probabilities written back into the scores scratch), then ALL PV
    matmuls back-to-back.  The two-phase kernel interleaves the VPU
    softmax with each head's PV matmul, which stalls the MXU pipeline
    once per head; separating the phases keeps the 16 PV matmuls as
    back-to-back independent MXU ops like the QK phase already is."""
    qkv_ref = refs[0]
    bias_ref = refs[1] if has_bias else None
    o_ref = refs[1 + has_bias]
    s_ref = refs[2 + has_bias]
    sc_ref = refs[3 + has_bias]
    ob_ref = refs[4 + has_bias]
    for b in range(block_rows):
        _three_phase_attn(
            lambda lo, hi, b=b: qkv_ref[b, :, lo:hi], sc_ref, ob_ref,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            bias_row=bias_ref[b] if bias_ref is not None else None,
            compute_dtype=qkv_ref.dtype)
        oq, rs = _quant_rows_out(ob_ref[:])
        s_ref[b] = rs
        o_ref[b] = oq


def mha_packed_q8(qkv: jax.Array, scale: float, num_heads: int,
                  block_rows: Optional[int] = None,
                  bias: Optional[jax.Array] = None):
    """(B, S, 3*H*D) -> (int8 (B, S, H*D), f32 (B, S, 1)) — inference only.

    block_rows batch items per grid program amortize per-program pipeline
    overhead (0.516 vs 0.567 ms/layer standalone at B=128 and S=192).
    Scaling rows with S at token-merged sizes measured WORSE (1590 vs 1626
    crops/s e2e at the aggressive merge schedule) — keep 2.
    bias: optional (B, S) per-key score bias (ToMe proportional attention)."""
    B, S, THD = qkv.shape
    HD = THD // 3
    D = HD // num_heads
    import os
    if block_rows is None:
        block_rows = 2
    block_rows = int(os.environ.get("THMR_ATTN_ROWS", block_rows))
    while block_rows > 1 and B % block_rows != 0:
        block_rows //= 2
    R = block_rows
    in_specs = [pl.BlockSpec((R, S, THD), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv]
    if bias is not None:
        in_specs.append(pl.BlockSpec((R, 1, S), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32)[:, None, :])
    # default since the measured win at the default merge schedule
    # (1181 vs 1135 crops/s e2e); THMR_ATTN_PHASES=2 restores the
    # interleaved variant
    three_phase = os.environ.get("THMR_ATTN_PHASES", "3") == "3"
    kernel = _mha_packed_q8_kernel3 if three_phase else _mha_packed_q8_kernel
    scratch = [
        pltpu.VMEM((num_heads, S, S), jnp.float32),
        pltpu.VMEM((S, HD), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(kernel, scale=scale,
                          num_heads=num_heads, head_dim=D, block_rows=R,
                          has_bias=bias is not None),
        grid=(B // R,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((R, S, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, HD), jnp.int8),
            jax.ShapeDtypeStruct((B, S, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * S * S * D,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
    )(*args)


# ---------------------------------------------------------------------------
# Fully fused qkv-projection + attention kernel (int8 inference path):
# the (B, S, 3HD) qkv tensor never exists in HBM.  Per grid program the
# int8 x-block (from ln_quant) hits the MXU against the resident int8 qkv
# weights (one great-shaped (R*S, K)@(K, 3HD) matmul), the dequantized
# result stays in VMEM, and the three-phase attention + int8-out epilogue
# runs on it directly.  Replaces ~189 MB/layer of qkv HBM write+read
# traffic at B=128/S=192 with a 31 MB int8 x read.
# ---------------------------------------------------------------------------

def _qkv_mha_q8_kernel(*refs, scale: float, num_heads: int, head_dim: int,
                       block_rows: int, has_bias: bool):
    xq_ref, xs_ref, wq_ref, wsb_ref = refs[0], refs[1], refs[2], refs[3]
    bias_ref = refs[4] if has_bias else None
    o_ref = refs[4 + has_bias]
    s_ref = refs[5 + has_bias]
    qkv_ref = refs[6 + has_bias]   # (S, 3HD) bf16 scratch
    sc_ref = refs[7 + has_bias]    # (H, S, S) f32 scratch
    ob_ref = refs[8 + has_bias]    # (S, HD) f32 scratch
    for b in range(block_rows):
        acc = jax.lax.dot_general(
            xq_ref[b], wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = acc.astype(jnp.float32) * xs_ref[b] * wsb_ref[0:1] + wsb_ref[1:2]
        qkv_ref[:] = h.astype(qkv_ref.dtype)
        _three_phase_attn(
            lambda lo, hi: qkv_ref[:, lo:hi], sc_ref, ob_ref,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            bias_row=bias_ref[b] if bias_ref is not None else None,
            compute_dtype=qkv_ref.dtype)
        oq, rs = _quant_rows_out(ob_ref[:])
        s_ref[b] = rs
        o_ref[b] = oq


def qkv_mha_q8(xq: jax.Array, xs: jax.Array, wq: jax.Array, ws: jax.Array,
               bias: jax.Array, scale: float, num_heads: int,
               attn_bias: Optional[jax.Array] = None,
               block_rows: Optional[int] = None, interpret: bool = False):
    """Fused `ln_quant-x @ Wqkv -> attention -> int8-out`.

    xq (B, S, K) int8 + xs (B, S, 1) f32 row scales (ln_quant output);
    wq (K, 3HD) int8 per-channel weights + ws (3HD,) scales + bias (3HD,);
    attn_bias optional (B, S) per-key score bias (ToMe log sizes).
    Returns (int8 (B, S, HD), f32 (B, S, 1)) like mha_packed_q8.
    """
    B, S, K = xq.shape
    THD = wq.shape[1]
    HD = THD // 3
    D = HD // num_heads
    import os as _os
    if block_rows is None:
        # R=2 everywhere: R=4 at merged sizes measured 1371 vs 1388 e2e
        # (same verdict as the pre-fusion kernels) and VMEM-OOMs at S=192
        block_rows = 2
    R = int(_os.environ.get("THMR_ATTN_ROWS", block_rows))
    while R > 1 and B % R != 0:
        R //= 2
    wsb = jnp.stack([ws.reshape(THD), bias.reshape(THD)]).astype(jnp.float32)
    in_specs = [
        pl.BlockSpec((R, S, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, S, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, THD), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, THD), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xq, xs.astype(jnp.float32), wq, wsb]
    if attn_bias is not None:
        in_specs.append(pl.BlockSpec((R, 1, S), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(attn_bias.astype(jnp.float32)[:, None, :])
    return pl.pallas_call(
        functools.partial(_qkv_mha_q8_kernel, scale=scale,
                          num_heads=num_heads, head_dim=D, block_rows=R,
                          has_bias=attn_bias is not None),
        grid=(B // R,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((R, S, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, HD), jnp.int8),
            jax.ShapeDtypeStruct((B, S, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, THD), jnp.bfloat16),
            pltpu.VMEM((num_heads, S, S), jnp.float32),
            pltpu.VMEM((S, HD), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * K * THD + 4 * B * num_heads * S * S * D,
            bytes_accessed=xq.size + wq.size + B * S * HD,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )(*args)


def _ln_qkv_mha_q8_kernel(*refs, scale: float, num_heads: int, head_dim: int,
                          block_rows: int, has_bias: bool, eps: float):
    """qkv_mha_q8 with the producer LayerNorm+quant folded in: reads the
    raw bf16 activations, LN+per-row-int8-quantizes them in VMEM, then the
    int8 qkv matmul + three-phase attention + int8-out epilogue.  The
    separate ln_quant kernel's int8 write+read round trip disappears."""
    x_ref, g_ref, b_ref, wq_ref, wsb_ref = (refs[0], refs[1], refs[2],
                                            refs[3], refs[4])
    bias_ref = refs[5] if has_bias else None
    o_ref = refs[5 + has_bias]
    s_ref = refs[6 + has_bias]
    qkv_ref = refs[7 + has_bias]   # (S, 3HD) bf16 scratch
    sc_ref = refs[8 + has_bias]    # (H, S, S) f32 scratch
    ob_ref = refs[9 + has_bias]    # (S, HD) f32 scratch
    for b in range(block_rows):
        xq, rs = _ln_quant_rows(x_ref[b].astype(jnp.float32),
                                g_ref[:], b_ref[:], eps)
        acc = jax.lax.dot_general(
            xq, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = acc.astype(jnp.float32) * rs * wsb_ref[0:1] + wsb_ref[1:2]
        qkv_ref[:] = h.astype(qkv_ref.dtype)
        _three_phase_attn(
            lambda lo, hi: qkv_ref[:, lo:hi], sc_ref, ob_ref,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            bias_row=bias_ref[b] if bias_ref is not None else None,
            compute_dtype=qkv_ref.dtype)
        oq, ors = _quant_rows_out(ob_ref[:])
        s_ref[b] = ors
        o_ref[b] = oq


def _ln_qkv_mha_q8_kernel_hoist(*refs, scale: float, num_heads: int,
                                head_dim: int, block_rows: int,
                                has_bias: bool, eps: float):
    """Cross-row phase hoist (ROADMAP perf #1): instead of running the
    three attention phases per batch row ([QK,SM,PV] x R), ALL rows' QK
    matmuls run back-to-back, then all softmaxes, then all PVs — R x
    fewer MXU<->VPU phase boundaries per program at the cost of R x the
    scores scratch ((R*H, S, S) f32) and an (R, S, 3HD) qkv scratch."""
    x_ref, g_ref, b_ref, wq_ref, wsb_ref = (refs[0], refs[1], refs[2],
                                            refs[3], refs[4])
    bias_ref = refs[5] if has_bias else None
    o_ref = refs[5 + has_bias]
    s_ref = refs[6 + has_bias]
    qkv_ref = refs[7 + has_bias]   # (R, S, 3HD) bf16 scratch
    sc_ref = refs[8 + has_bias]    # (R*H, S, S) f32 scratch
    ob_ref = refs[9 + has_bias]    # (S, HD) f32 scratch
    H, D = num_heads, head_dim
    HD = H * D
    for b in range(block_rows):
        xq, rs = _ln_quant_rows(x_ref[b].astype(jnp.float32),
                                g_ref[:], b_ref[:], eps)
        acc = jax.lax.dot_general(
            xq, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = acc.astype(jnp.float32) * rs * wsb_ref[0:1] + wsb_ref[1:2]
        qkv_ref[b] = h.astype(qkv_ref.dtype)
    for b in range(block_rows):
        for hh in range(H):
            q = qkv_ref[b, :, hh * D:(hh + 1) * D]
            k = qkv_ref[b, :, HD + hh * D: HD + (hh + 1) * D]
            sc_ref[b * H + hh] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    for b in range(block_rows):
        for hh in range(H):
            s = sc_ref[b * H + hh] * scale
            if bias_ref is not None:
                s = s + bias_ref[b]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            sc_ref[b * H + hh] = p / jnp.sum(p, axis=-1, keepdims=True)
    for b in range(block_rows):
        for hh in range(H):
            v = qkv_ref[b, :, 2 * HD + hh * D: 2 * HD + (hh + 1) * D]
            ob_ref[:, hh * D:(hh + 1) * D] = jnp.dot(
                sc_ref[b * H + hh].astype(qkv_ref.dtype), v,
                preferred_element_type=jnp.float32)
        oq, ors = _quant_rows_out(ob_ref[:])
        s_ref[b] = ors
        o_ref[b] = oq


def _hoist_plan(mode: str, B: int, S: int, K: int, THD: int, HD: int,
                num_heads: int, r_default: int, proj: bool = False):
    """Decide whether to run the cross-row phase-hoisted kernel, and at
    what row-block R.

    mode "0": off.  mode "1": legacy always-on at the caller's R (fails
    real-v5e scoped VMEM at S=192 — kept for interpret tests).  mode
    "auto": enable per-call whenever the program's VMEM estimate fits a
    13 MB budget, picking the largest R in {8,4,2} that divides B — the
    hoist batches R*H matmuls per MXU phase, which pays exactly where
    attention is latency-bound: the small merged segment sizes of the
    ToMe schedule (S<=112 at the 5-site default).  At S=192 the scores
    scratch alone is 4.7 MB at R=2 and the estimate blows the budget, so
    auto degrades to the per-row kernel there (measured-correct
    behaviour: the real-chip compile failure that killed mode "1").

    proj=True plans the proj+residual-fused block kernel (attn_block_q8):
    the resident proj weights, bf16 residual/out blocks and the R-row f32
    attention-out scratch are added to the estimate."""
    if mode == "0" or B == 1:
        return False, r_default
    if mode == "1":
        return r_default > 1, r_default
    for R in (8, 4, 2):
        if B % R:
            continue
        est = (
            2 * (R * S * K * 2          # bf16 x block (double-buffered)
                 + R * S * 4)           # attn-bias block
            + K * THD + 2 * THD * 4     # resident int8 qkv weights + scales
            + R * S * THD * 2           # bf16 qkv scratch
            + R * num_heads * S * S * 4  # f32 scores scratch
        )
        if proj:
            est += (
                HD * K + 2 * K * 4       # resident int8 proj weights + scales
                + 2 * (R * S * K * 2)    # bf16 residual block
                + 2 * (R * S * K * 2)    # bf16 out block
                + R * S * HD * 4         # f32 attention-out scratch (R rows)
            )
        else:
            est += (
                2 * (R * S * HD          # int8 out block
                     + R * S * 4)        # out-scale block
                + S * HD * 4             # f32 out scratch
            )
        if est <= 13 * 2**20:
            return True, R
    return False, r_default


def ln_qkv_mha_q8(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                  wq: jax.Array, ws: jax.Array, bias: jax.Array,
                  scale: float, num_heads: int,
                  attn_bias: Optional[jax.Array] = None,
                  block_rows: Optional[int] = None, eps: float = 1e-6,
                  interpret: bool = False):
    """Fused `LayerNorm -> int8 quant -> x @ Wqkv -> attention -> int8-out`.

    x (B, S, K) raw activations; gamma/beta (K,) LN affine; wq/ws/bias the
    int8 qkv weights; attn_bias optional (B, S).  Returns
    (int8 (B, S, HD), f32 (B, S, 1)) like mha_packed_q8."""
    B, S, K = x.shape
    THD = wq.shape[1]
    HD = THD // 3
    D = HD // num_heads
    import os as _os
    if block_rows is None:
        # R=2 everywhere: R=4 at merged sizes measured 1371 vs 1388 e2e
        # (same verdict as the pre-fusion kernels) and VMEM-OOMs at S=192
        block_rows = 2
    R = int(_os.environ.get("THMR_ATTN_ROWS", block_rows))
    while R > 1 and B % R != 0:
        R //= 2
    hoist, R = _hoist_plan(_os.environ.get("THMR_ATTN_HOIST", "0"),
                           B, S, K, THD, HD, num_heads, R)
    wsb = jnp.stack([ws.reshape(THD), bias.reshape(THD)]).astype(jnp.float32)
    in_specs = [
        pl.BlockSpec((R, S, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, THD), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, THD), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, gamma.reshape(1, K).astype(jnp.float32),
            beta.reshape(1, K).astype(jnp.float32), wq, wsb]
    if attn_bias is not None:
        in_specs.append(pl.BlockSpec((R, 1, S), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(attn_bias.astype(jnp.float32)[:, None, :])
    kernel = (_ln_qkv_mha_q8_kernel_hoist if hoist
              else _ln_qkv_mha_q8_kernel)
    scratch = ([
        pltpu.VMEM((R, S, THD), jnp.bfloat16),
        pltpu.VMEM((R * num_heads, S, S), jnp.float32),
        pltpu.VMEM((S, HD), jnp.float32),
    ] if hoist else [
        pltpu.VMEM((S, THD), jnp.bfloat16),
        pltpu.VMEM((num_heads, S, S), jnp.float32),
        pltpu.VMEM((S, HD), jnp.float32),
    ])
    return pl.pallas_call(
        functools.partial(kernel, scale=scale,
                          num_heads=num_heads, head_dim=D, block_rows=R,
                          has_bias=attn_bias is not None, eps=eps),
        grid=(B // R,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((R, S, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, HD), jnp.int8),
            jax.ShapeDtypeStruct((B, S, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * K * THD + 4 * B * num_heads * S * S * D,
            bytes_accessed=x.size * x.dtype.itemsize + wq.size + B * S * HD,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )(*args)


def _attn_block_q8_kernel(*refs, scale: float, num_heads: int, head_dim: int,
                          block_rows: int, has_bias: bool, eps: float):
    """The full attention half-block in ONE kernel: LN -> int8 quant ->
    qkv matmul -> three-phase attention -> int8 quant -> proj matmul ->
    +residual -> bf16 out.  Nothing between the LN input and the residual
    output ever touches HBM."""
    (x_ref, g_ref, b_ref, wq_ref, wsb_ref, wp_ref, wpb_ref, r_ref) = refs[:8]
    bias_ref = refs[8] if has_bias else None
    o_ref = refs[8 + has_bias]
    qkv_ref = refs[9 + has_bias]   # (S, 3HD) bf16 scratch
    sc_ref = refs[10 + has_bias]   # (H, S, S) f32 scratch
    ob_ref = refs[11 + has_bias]   # (S, HD) f32 scratch
    for b in range(block_rows):
        xq, rs = _ln_quant_rows(x_ref[b].astype(jnp.float32),
                                g_ref[:], b_ref[:], eps)
        acc = jax.lax.dot_general(
            xq, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qkv_ref[:] = (acc.astype(jnp.float32) * rs * wsb_ref[0:1]
                      + wsb_ref[1:2]).astype(qkv_ref.dtype)
        _three_phase_attn(
            lambda lo, hi: qkv_ref[:, lo:hi], sc_ref, ob_ref,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            bias_row=bias_ref[b] if bias_ref is not None else None,
            compute_dtype=qkv_ref.dtype)
        oq, ors = _quant_rows_out(ob_ref[:])
        acc2 = jax.lax.dot_general(
            oq, wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = (acc2.astype(jnp.float32) * ors * wpb_ref[0:1] + wpb_ref[1:2]
               + r_ref[b].astype(jnp.float32))
        o_ref[b] = out.astype(o_ref.dtype)


def _attn_block_q8_kernel_hoist(*refs, scale: float, num_heads: int,
                                head_dim: int, block_rows: int,
                                has_bias: bool, eps: float):
    """attn_block_q8 with the cross-row phase hoist: every stage (LN+qkv,
    QK, softmax, PV, quant+proj+residual) runs back-to-back over all R
    rows, so each MXU phase batches R (or R*H) matmuls instead of one.
    Costs R x the scores and attention-out scratches — only dispatched
    where _hoist_plan(proj=True)'s VMEM estimate fits."""
    (x_ref, g_ref, b_ref, wq_ref, wsb_ref, wp_ref, wpb_ref, r_ref) = refs[:8]
    bias_ref = refs[8] if has_bias else None
    o_ref = refs[8 + has_bias]
    qkv_ref = refs[9 + has_bias]   # (R, S, 3HD) bf16 scratch
    sc_ref = refs[10 + has_bias]   # (R*H, S, S) f32 scratch
    ob_ref = refs[11 + has_bias]   # (R, S, HD) f32 scratch
    H, D = num_heads, head_dim
    HD = H * D
    for b in range(block_rows):
        xq, rs = _ln_quant_rows(x_ref[b].astype(jnp.float32),
                                g_ref[:], b_ref[:], eps)
        acc = jax.lax.dot_general(
            xq, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qkv_ref[b] = (acc.astype(jnp.float32) * rs * wsb_ref[0:1]
                      + wsb_ref[1:2]).astype(qkv_ref.dtype)
    for b in range(block_rows):
        for hh in range(H):
            q = qkv_ref[b, :, hh * D:(hh + 1) * D]
            k = qkv_ref[b, :, HD + hh * D: HD + (hh + 1) * D]
            sc_ref[b * H + hh] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    for b in range(block_rows):
        for hh in range(H):
            s = sc_ref[b * H + hh] * scale
            if bias_ref is not None:
                s = s + bias_ref[b]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            sc_ref[b * H + hh] = p / jnp.sum(p, axis=-1, keepdims=True)
    for b in range(block_rows):
        for hh in range(H):
            v = qkv_ref[b, :, 2 * HD + hh * D: 2 * HD + (hh + 1) * D]
            ob_ref[b, :, hh * D:(hh + 1) * D] = jnp.dot(
                sc_ref[b * H + hh].astype(qkv_ref.dtype), v,
                preferred_element_type=jnp.float32)
    for b in range(block_rows):
        oq, ors = _quant_rows_out(ob_ref[b])
        acc2 = jax.lax.dot_general(
            oq, wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = (acc2.astype(jnp.float32) * ors * wpb_ref[0:1] + wpb_ref[1:2]
               + r_ref[b].astype(jnp.float32))
        o_ref[b] = out.astype(o_ref.dtype)


def attn_block_q8(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                  wq: jax.Array, ws: jax.Array, bias: jax.Array,
                  wq_proj: jax.Array, ws_proj: jax.Array,
                  bias_proj: jax.Array, residual: jax.Array,
                  scale: float, num_heads: int,
                  attn_bias: Optional[jax.Array] = None,
                  block_rows: Optional[int] = None, eps: float = 1e-6,
                  interpret: bool = False) -> jax.Array:
    """`residual + proj(attn(qkv(quant(LN(x)))))` as one pallas kernel.

    Fits VMEM only for S <= ~160 (the (H, S, S) scores scratch plus both
    resident weights); callers gate on S.  Returns bf16 (B, S, K)."""
    B, S, K = x.shape
    THD = wq.shape[1]
    HD = THD // 3
    D = HD // num_heads
    import os as _os
    if block_rows is None:
        block_rows = 2
    R = int(_os.environ.get("THMR_ATTN_ROWS", block_rows))
    while R > 1 and B % R != 0:
        R //= 2
    hoist, R = _hoist_plan(_os.environ.get("THMR_ATTN_HOIST", "0"),
                           B, S, K, THD, HD, num_heads, R, proj=True)
    wsb = jnp.stack([ws.reshape(THD), bias.reshape(THD)]).astype(jnp.float32)
    wpb = jnp.stack([ws_proj.reshape(K), bias_proj.reshape(K)]
                    ).astype(jnp.float32)
    in_specs = [
        pl.BlockSpec((R, S, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, THD), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, THD), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((HD, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, S, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, gamma.reshape(1, K).astype(jnp.float32),
            beta.reshape(1, K).astype(jnp.float32), wq, wsb,
            wq_proj, wpb, residual]
    if attn_bias is not None:
        in_specs.append(pl.BlockSpec((R, 1, S), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(attn_bias.astype(jnp.float32)[:, None, :])
    if hoist:
        kernel = _attn_block_q8_kernel_hoist
        scratch = [
            pltpu.VMEM((R, S, THD), jnp.bfloat16),
            pltpu.VMEM((R * num_heads, S, S), jnp.float32),
            pltpu.VMEM((R, S, HD), jnp.float32),
        ]
    else:
        kernel = _attn_block_q8_kernel
        scratch = [
            pltpu.VMEM((S, THD), jnp.bfloat16),
            pltpu.VMEM((num_heads, S, S), jnp.float32),
            pltpu.VMEM((S, HD), jnp.float32),
        ]
    return pl.pallas_call(
        functools.partial(kernel, scale=scale,
                          num_heads=num_heads, head_dim=D, block_rows=R,
                          has_bias=attn_bias is not None, eps=eps),
        grid=(B // R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, S, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, K), residual.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * K * THD + 4 * B * num_heads * S * S * D
            + 2 * B * S * HD * K,
            bytes_accessed=x.size * x.dtype.itemsize * 3
            + wq.size + wq_proj.size,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=interpret,
    )(*args)


def _split_packed(qkv: jax.Array, num_heads: int):
    """(B, S, 3HD) -> three (B, H, S, D)."""
    B, S, THD = qkv.shape
    HD = THD // 3
    D = HD // num_heads
    def part(i):
        return qkv[:, :, i * HD:(i + 1) * HD].reshape(B, S, num_heads, D
                                                      ).transpose(0, 2, 1, 3)
    return part(0), part(1), part(2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def mha_packed(qkv, scale, num_heads):
    """(B, S, 3*H*D) packed qkv -> (B, S, H*D) attention output."""
    return _mha_packed_impl(qkv, scale, num_heads)


def _mha_packed_fwd(qkv, scale, num_heads):
    return _mha_packed_impl(qkv, scale, num_heads), (qkv,)


def _mha_packed_bwd(scale, num_heads, res, g):
    (qkv,) = res
    B, S, THD = qkv.shape
    HD = THD // 3
    D = HD // num_heads
    q, k, v = _split_packed(qkv, num_heads)
    gt = g.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
    dq, dk, dv = _mha_pallas_bwd(scale, (q, k, v), gt)
    def unpart(t):
        return t.transpose(0, 2, 1, 3).reshape(B, S, HD)
    dqkv = jnp.concatenate([unpart(dq), unpart(dk), unpart(dv)], axis=-1)
    return (dqkv.astype(qkv.dtype),)


mha_packed.defvjp(_mha_packed_fwd, _mha_packed_bwd)


def mha_packed_bias(qkv: jax.Array, bias: jax.Array, scale: float,
                    num_heads: int) -> jax.Array:
    """Packed attention with a per-key additive score bias (B, S) —
    ToMe proportional attention.  Inference-only (no custom VJP)."""
    return _mha_packed_impl(qkv, scale, num_heads, bias=bias)


def mha_packed_xla(qkv: jax.Array, scale: float, num_heads: int,
                   bias: Optional[jax.Array] = None) -> jax.Array:
    """Reference path for the packed (B, S, 3HD) layout (CPU/tests)."""
    B, S, THD = qkv.shape
    HD = THD // 3
    q, k, v = _split_packed(qkv, num_heads)
    o = mha_xla(q, k, v, scale, bias=bias)
    return o.transpose(0, 2, 1, 3).reshape(B, S, HD)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    impl: str = "auto",
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused softmax attention.  impl in {auto, pallas, xla}.
    bias: optional (B, T) per-key score bias (routes through XLA)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "pallas" and bias is None:
        return _mha_pallas(q, k, v, float(scale))
    return mha_xla(q, k, v, scale, bias=bias)
