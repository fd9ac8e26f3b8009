"""Dynamically-quantized int8 matmul for the ViT-H dense layers.

The reference runs its ViT-H dense layers (qkv/proj/fc1/fc2, ref
`tokenhmr/lib/models/backbones/vit.py:89-126,129-141`) in fp16 via cuBLAS.
On TPU v5e the MXU has a 2x int8 rate (394 TOPS nameplate vs 197 bf16);
measured on real hardware (docs/PERF_NOTES.md round 2):

  * XLA int8 dot: 220-235 TOPS on fc1/qkv shapes (1.57-1.59x over bf16)
  * Pallas int8 kernel: 262 TOPS on the fc2 shape (1.70x)
  * (per-op dispatch timings are corrupted by ~1 ms of tunnel overhead —
    always benchmark inside one jit, e.g. lax.scan over layers)

Scheme: W8A8 with
  * activations: per-token (row) dynamic symmetric quant, computed on the
    fly — fuses into the preceding LayerNorm's elementwise chain under XLA
  * weights: per-output-channel (column) symmetric quant, computed from the
    bf16 master weights inside the jit (cost: one VPU pass over the weight,
    ~0.1% of the matmul; avoids checkpoint surgery and keeps the param tree
    identical to the bf16 path)
  * int32 MXU accumulation, fused f32 dequant + bias + optional tanh-GELU
    epilogue in the kernel, bf16 out

This is an inference path: no custom VJP is defined (training keeps bf16;
`quant` is rejected by the train step).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports everywhere but only lowers on TPU
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def quantize_rows(x: jax.Array, eps: float = 1e-8):
    """Per-row symmetric int8 quant: (M, K) -> (int8 (M, K), f32 (M, 1))."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), eps) / 127.0
    q = jnp.clip(jnp.rint(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_cols(w: jax.Array, eps: float = 1e-8):
    """Per-column symmetric int8 quant: (K, N) -> (int8 (K, N), f32 (1, N))."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), eps) / 127.0
    q = jnp.clip(jnp.rint(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _apply_act(h: jax.Array, act: Optional[str]) -> jax.Array:
    if act is None:
        return h
    if act == "gelu_tanh":
        return jax.nn.gelu(h, approximate=True)
    if act == "gelu":
        return jax.nn.gelu(h, approximate=False)
    raise ValueError(f"unknown epilogue activation {act!r}")


def _epi_kernel(*refs, act, has_bias, has_res):
    """(xq, xs, wq, ws[, bias][, residual], out): int8 dot + fused epilogue."""
    it = iter(refs)
    xq_ref, xs_ref, wq_ref, ws_ref = next(it), next(it), next(it), next(it)
    b_ref = next(it) if has_bias else None
    r_ref = next(it) if has_res else None
    o_ref = next(it)
    acc = jax.lax.dot_general(
        xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]
    if b_ref is not None:
        h = h + b_ref[:]
    h = _apply_act(h, act)
    if r_ref is not None:
        h = h + r_ref[:].astype(jnp.float32)
    o_ref[:] = h.astype(o_ref.dtype)


def _pick_tile(dim: int, cap: int, mult: int) -> Optional[int]:
    """Largest divisor of `dim` that is <= cap and a multiple of `mult`."""
    best = None
    for t in range(mult, min(dim, cap) + 1, mult):
        if dim % t == 0:
            best = t
    return best


def int8_matmul_pallas(
    xq: jax.Array,
    xs: jax.Array,
    wq: jax.Array,
    ws: jax.Array,
    bias: Optional[jax.Array] = None,
    act: Optional[str] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
    tm: Optional[int] = None,
    tn: Optional[int] = None,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """(M, K) int8 @ (K, N) int8 -> (M, N) out_dtype, fused dequant+bias+act
    (+ optional residual add: out = act(x@w + b) + residual).

    Raises ValueError if the shape can't be tiled; callers should use
    `int8_dense` which falls back to XLA.
    """
    M, K = xq.shape
    K2, N = wq.shape
    assert K == K2, (xq.shape, wq.shape)
    # tile sweep on v5e (docs/PERF_NOTES.md round 2): large-K shapes want
    # (512, 1024); small-N shapes want a wide M block; VMEM overflows past
    # ~TM*K + K*TN + 2*TM*TN bytes ~ 8MB (remote compile HTTP 500)
    if tm is None:
        tm = 512 if K >= 2048 or residual is not None else 1024
    if tn is None:
        tn = 1024 if N > 1536 else 1280
    TM = _pick_tile(M, tm, 32)
    TN = _pick_tile(N, tn, 128)
    if TM is None or TN is None or K % 128 != 0:
        raise ValueError(f"untileable int8 matmul shape M={M} K={K} N={N}")

    spec_x = pl.BlockSpec((TM, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    spec_xs = pl.BlockSpec((TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((K, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((TM, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    in_specs = [spec_x, spec_xs, spec_w, spec_n]
    args = [xq, xs.astype(jnp.float32), wq, ws.astype(jnp.float32)]
    if bias is not None:
        in_specs.append(spec_n)
        args.append(bias.reshape(1, N).astype(jnp.float32))
    aliases = {}
    if residual is not None:
        in_specs.append(spec_o)
        res2 = residual.reshape(M, N)
        args.append(res2)
        if res2.dtype == out_dtype:
            # donate the residual buffer to the output: in the scanned ViT
            # block the residual IS the carry, so this guarantees the
            # in-place update instead of relying on XLA's buffer reuse
            # (measured neutral at B=128 — XLA already avoided the copy —
            # but the alias makes it a contract, not an optimization; XLA
            # inserts a protective copy if the buffer is live elsewhere)
            aliases = {len(args) - 1: 0}
    return pl.pallas_call(
        functools.partial(_epi_kernel, act=act, has_bias=bias is not None,
                          has_res=residual is not None),
        grid=(M // TM, N // TN),
        in_specs=in_specs,
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=M * N if act else 0,
        ),
        interpret=interpret,
    )(*args)


def int8_matmul_xla(
    xq: jax.Array,
    xs: jax.Array,
    wq: jax.Array,
    ws: jax.Array,
    bias: Optional[jax.Array] = None,
    act: Optional[str] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    h = acc.astype(jnp.float32) * xs.astype(jnp.float32) * ws.astype(jnp.float32)
    if bias is not None:
        h = h + bias.astype(jnp.float32)
    h = _apply_act(h, act)
    if residual is not None:
        h = h + residual.reshape(h.shape).astype(jnp.float32)
    return h.astype(out_dtype)


def _ln_mm_q8_kernel(x_ref, g_ref, b_ref, wq_ref, ws_ref, bias_ref, qs_ref,
                     o_ref, *, act, eps):
    """LN prologue + int8 matmul + act + static-scale int8-out epilogue."""
    xf = x_ref[:].astype(jnp.float32)                 # (TM, K)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]
    rs = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.rint(y / rs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc.astype(jnp.float32) * rs * ws_ref[:] + bias_ref[:]
    h = _apply_act(h, act)
    o_ref[:] = jnp.clip(jnp.rint(h / qs_ref[:]), -127, 127).astype(jnp.int8)


def ln_int8_matmul_q8(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    wq: jax.Array,
    ws: jax.Array,
    bias: jax.Array,
    quant_out_scale: jax.Array,
    act: Optional[str] = "gelu_tanh",
    eps: float = 1e-6,
    tm: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused `LayerNorm -> int8 quant -> x @ W -> act -> static int8-out`
    for the norm2->fc1 edge: neither the LN output nor its int8 quant ever
    round-trips HBM.  x (..., K) raw activations; wq (K, N) int8 +
    ws (N,) scales + bias (N,); quant_out_scale (N,) static per-channel
    output scales (fc1_out_scale from calibration).  Returns int8 (..., N).
    The weight stays resident in VMEM across the M-tiled grid (fc1's
    (1280, 5120) int8 = 6.6 MB)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = wq.shape[1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    TM = _pick_tile(M, tm, 8)
    if TM is None or K % 128 != 0 or N % 128 != 0:
        raise ValueError(f"untileable ln+matmul shape M={M} K={K} N={N}")
    out = pl.pallas_call(
        functools.partial(_ln_mm_q8_kernel, act=act, eps=eps),
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * 2 + K * N + M * N,
            transcendentals=M * N,
        ),
        interpret=interpret,
    )(x2, gamma.reshape(1, K).astype(jnp.float32),
      beta.reshape(1, K).astype(jnp.float32), wq,
      ws.reshape(1, N).astype(jnp.float32),
      bias.reshape(1, N).astype(jnp.float32),
      quant_out_scale.reshape(1, N).astype(jnp.float32))
    return out.reshape(*lead, N)


def _ln_quant_kernel(x_ref, g_ref, b_ref, q_ref, s_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]
    rs = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-8) / 127.0
    s_ref[:] = rs
    q_ref[:] = jnp.clip(jnp.rint(y / rs), -127, 127).astype(jnp.int8)


def ln_quant(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
):
    """Fused LayerNorm + per-row int8 quant: (..., C) -> (int8, f32 scales).

    One HBM read of x and one int8 write replace the XLA chain of
    LN-stats fusion + scale fusion + quant write (~0.34 -> ~0.12 ms/layer
    at B=128 on v5e).  Matches flax nn.LayerNorm numerics (mean-of-squares
    variance, f32 compute).
    """
    lead = x.shape[:-1]
    C = x.shape[-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    TM = _pick_tile(M, 512, 8)
    if TM is None or C % 128 != 0:
        raise ValueError(f"untileable ln_quant shape M={M} C={C}")
    q, s = pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TM, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, C), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * M * C, bytes_accessed=M * C * 3, transcendentals=M),
        interpret=interpret,
    )(x2, gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32))
    return q.reshape(*lead, C), s.reshape(*lead, 1)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def int8_dense(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    act: Optional[str] = None,
    out_dtype: Optional[jnp.dtype] = None,
    impl: str = "auto",
    residual: Optional[jax.Array] = None,
    x_prequant: Optional[tuple] = None,
    in_scale: Optional[jax.Array] = None,
    quant_out_scale: Optional[jax.Array] = None,
    w_prequant: Optional[tuple] = None,
) -> jax.Array:
    """Drop-in quantized replacement for `act(x @ w + b) [+ residual]`.

    x: (..., K) float; w: (K, N) float master weights (quantized on the fly,
    per column); bias: (N,) or None.  Leading dims of x are flattened to M.
    x_prequant: optional (int8 (..., K), f32 (..., 1) or None) pair from a
    producer that already quantized — skips the quantize_rows pass; `x` may
    then be None.  A None scale means STATIC per-channel quantization: pass
    the producer's per-channel scales as `in_scale` (K,) and they are folded
    into the weight quantization (W' = diag(in_scale) @ W), SmoothQuant-style.
    w_prequant: optional (int8 (K, N), f32 (1, N)) pre-quantized weights —
    skips the per-call quantize_cols pass (weights quantized once at model
    load / calibration).  Any in_scale fold must already be baked in; `w`
    may then be None.
    quant_out_scale: (N,) static per-channel output scales — the result is
    returned as int8 (act(xw+b)/scale, rounded+clipped); lets XLA fuse the
    downstream consumer's quantization into this matmul's epilogue so the
    bf16 intermediate never exists in HBM.
    impl: auto | pallas | xla.  auto = pallas on TPU when the shape tiles,
    else XLA (which still uses the int8 MXU path).
    """
    if x_prequant is not None:
        xq_nd, xs_nd = x_prequant
        out_dtype = out_dtype or jnp.bfloat16
        lead = xq_nd.shape[:-1]
        K = xq_nd.shape[-1]
        xq = xq_nd.reshape(-1, K)
        if xs_nd is None:
            assert in_scale is not None or w_prequant is not None, (
                "static x_prequant needs in_scale (or w_prequant with the "
                "fold baked in)")
            xs = jnp.ones((xq.shape[0], 1), jnp.float32)
        else:
            xs = xs_nd.reshape(-1, 1)
    else:
        out_dtype = out_dtype or x.dtype
        lead = x.shape[:-1]
        K = x.shape[-1]
        xq, xs = quantize_rows(x.reshape(-1, K))
    if w_prequant is not None:
        wq, ws = w_prequant
        ws = ws.reshape(1, -1)
        N = wq.shape[-1]
        assert in_scale is None, (
            "w_prequant must already include any in_scale fold; don't pass "
            "in_scale alongside it")
    else:
        N = w.shape[-1]
        if in_scale is not None:
            w = w.astype(jnp.float32) * in_scale.reshape(K, 1)
        wq, ws = quantize_cols(w)
    if quant_out_scale is not None:
        # static-out path is elementwise after the dot -> let XLA fuse it
        assert residual is None
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        h = acc.astype(jnp.float32) * xs * ws.astype(jnp.float32)
        if bias is not None:
            h = h + bias.astype(jnp.float32)
        h = _apply_act(h, act) / quant_out_scale.reshape(1, N)
        q = jnp.clip(jnp.rint(h), -127, 127).astype(jnp.int8)
        return q.reshape(*lead, N)
    res2 = residual.reshape(-1, N) if residual is not None else None
    if impl == "auto":
        if not _on_tpu():
            impl = "xla"
        elif K >= 2048 or N <= 1536:
            # measured per-shape winners on v5e (in-jit scan, B=128):
            #   fc2 (K=5120): pallas 252 TOPS vs xla 230
            #   proj (N=1280): pallas 137 vs xla 121
            #   fc1/qkv (K=1280, wide N): xla 235/220 vs pallas 207/181
            impl = "pallas"
        else:
            impl = "xla"
    if impl == "pallas":
        try:
            out = int8_matmul_pallas(xq, xs, wq, ws, bias, act, out_dtype,
                                     residual=res2)
        except ValueError:
            out = int8_matmul_xla(xq, xs, wq, ws, bias, act, out_dtype,
                                  residual=res2)
    else:
        out = int8_matmul_xla(xq, xs, wq, ws, bias, act, out_dtype,
                              residual=res2)
    return out.reshape(*lead, N)


# ---------------------------------------------------------------------------
# Fully fused MLP block (ROADMAP perf #2): fc1 + GELU + static int8 requant
# + fc2 + bias + residual in ONE pallas call with the hidden dimension
# K-chunked over the grid — the (M, 4C) hidden tensor never exists in HBM
# (saves its int8 write+read per layer; the bf16 variant saved by the
# existing static path stays saved).  Requires the calibrated static
# fc1_out_scale path (scales `s`, fc2 weights recorded with the s-fold).
# ---------------------------------------------------------------------------

def _mlp_q8_kernel(xq_ref, xs_ref, w1_ref, w1s_ref, b1_ref, s_ref,
                   w2_ref, w2s_ref, b2_ref, r_ref, o_ref, acc_ref,
                   *, act, n_chunks):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc1 = jax.lax.dot_general(
        xq_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc1.astype(jnp.float32) * xs_ref[:] * w1s_ref[:] + b1_ref[:]
    h = _apply_act(h, act)
    aq = jnp.clip(jnp.rint(h / s_ref[:]), -127, 127).astype(jnp.int8)
    acc_ref[...] += jax.lax.dot_general(
        aq, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when(c == n_chunks - 1)
    def fin():
        out = acc_ref[...] * w2s_ref[:] + b2_ref[:] \
            + r_ref[:].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def fused_mlp_q8(xq: jax.Array, xs: jax.Array,
                 w1q: jax.Array, w1s: jax.Array, b1: jax.Array,
                 s: jax.Array,
                 w2q: jax.Array, w2s: jax.Array, b2: jax.Array,
                 residual: jax.Array, act: str = "gelu_tanh",
                 out_dtype: jnp.dtype = jnp.bfloat16,
                 tm: int = 256, tc: int = 1280,
                 interpret: bool = False) -> jax.Array:
    """xq (M, K) int8 + xs (M, 1) row scales -> (M, K) out_dtype.

    w1q/w1s/b1: fc1 int8 weights (K, NH) / col scales / bias; s (NH,)
    static fc1-output scales; w2q (NH, K) fc2 int8 weights RECORDED WITH
    THE s-FOLD (ViTMlp calib path) + w2s col scales + b2; residual (M, K).
    """
    M, K = xq.shape
    NH = w1q.shape[1]
    TM = _pick_tile(M, tm, 32)
    TC = _pick_tile(NH, tc, 128)
    if TM is None or TC is None or K % 128 != 0:
        raise ValueError(f"untileable fused MLP shape M={M} K={K} NH={NH}")
    n_chunks = NH // TC
    f32 = jnp.float32
    spec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_q8_kernel, act=act, n_chunks=n_chunks),
        grid=(M // TM, n_chunks),
        in_specs=[
            spec((TM, K), lambda i, c: (i, 0)),          # xq
            spec((TM, 1), lambda i, c: (i, 0)),          # xs
            spec((K, TC), lambda i, c: (0, c)),          # w1 chunk
            spec((1, TC), lambda i, c: (0, c)),          # w1s chunk
            spec((1, TC), lambda i, c: (0, c)),          # b1 chunk
            spec((1, TC), lambda i, c: (0, c)),          # s chunk
            spec((TC, K), lambda i, c: (c, 0)),          # w2 chunk
            spec((1, K), lambda i, c: (0, 0)),           # w2s
            spec((1, K), lambda i, c: (0, 0)),           # b2
            spec((TM, K), lambda i, c: (i, 0)),          # residual
        ],
        out_specs=spec((TM, K), lambda i, c: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, K), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, K), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * NH * 2,
            bytes_accessed=M * K * 4 + K * NH * 2,
            transcendentals=M * NH,
        ),
        interpret=interpret,
    )(xq, xs.astype(f32), w1q, w1s.reshape(1, NH).astype(f32),
      b1.reshape(1, NH).astype(f32), s.reshape(1, NH).astype(f32),
      w2q, w2s.reshape(1, K).astype(f32), b2.reshape(1, K).astype(f32),
      residual.reshape(M, K))
