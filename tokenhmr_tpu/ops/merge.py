"""Token merging (ToMe-style) for the ViT backbone.

Reduces the ViT token count mid-network by merging the most similar token
pairs — the public "Token Merging: Your ViT But Faster" recipe (Bolya et
al., ICLR 2023), which works on off-the-shelf weights without retraining.
The reference runs all 32 ViT-H blocks at a fixed 192 tokens
(`/root/reference/tokenhmr/lib/models/backbones/vit.py:320-339`); this is
a TPU-side throughput option the reference has no analogue of.

TPU-first formulation: everything is static-shaped so it jits cleanly —
the number of merged tokens `r` is a compile-time constant, the bipartite
partition is the even/odd token split, top-r selection is one argsort, and
the scatter-accumulate of merged tokens is expressed as a small batched
matmul (one-hot^T @ rows) that rides the MXU instead of a serialized
scatter.

Token "sizes" (how many original patches each token represents) are
tracked so that (a) merged means are weighted correctly and (b) attention
can apply the proportional-attention bias log(size) on keys, which is what
keeps softmax statistics calibrated after merging.

Merging changes which tokens exist, so outputs are NOT bit-identical to
the unmerged model; it is an opt-in inference path (ViTConfig.merge_*).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def bipartite_soft_match(
    metric: jax.Array,       # (B, S, C) similarity features (pre-norm ok)
    r: int,                  # number of tokens to remove (static)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Plan a merge of `r` tokens: returns (src_idx, dst_idx, keep_idx).

    Tokens are split into set A (even positions, merge candidates) and
    set B (odd positions, merge targets).  Each A token is matched to its
    most cosine-similar B token; the r highest-similarity A tokens are
    merged into their targets, the remaining A tokens are kept.

    Returns (per batch row):
      src_idx  (B, r)      indices INTO A of merged tokens
      dst_idx  (B, r)      indices INTO B of their merge targets
      keep_idx (B, SA - r) indices INTO A of kept tokens
    """
    B, S, C = metric.shape
    SA = (S + 1) // 2
    assert 0 < r < SA, (
        f"cannot merge r={r} of S={S} tokens: bipartite matching merges "
        f"at most ceil(S/2)-1 = {SA - 1} per step (split the merge across "
        f"two schedule entries instead)")

    m = metric.astype(jnp.float32)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
    a, b = m[:, 0::2], m[:, 1::2]                       # (B, SA, C), (B, SB, C)
    sim = jnp.einsum("bac,bkc->bak", a, b)              # (B, SA, SB)
    best = jnp.max(sim, axis=-1)                        # (B, SA)
    dst_of_a = jnp.argmax(sim, axis=-1)                 # (B, SA)

    order = jnp.argsort(-best, axis=-1)                 # most similar first
    src_idx = order[:, :r]
    keep_idx = order[:, r:]
    dst_idx = jnp.take_along_axis(dst_of_a, src_idx, axis=-1)
    return src_idx, dst_idx, keep_idx


def merge_tokens(
    x: jax.Array,            # (B, S, C) tokens
    sizes: Optional[jax.Array],  # (B, S) or None (=> all ones)
    r: int,
    metric: Optional[jax.Array] = None,  # similarity features; the ToMe
    # paper matches on attention keys (head-mean) — the ViT merged path
    # passes the upcoming block's keys; defaults to x when absent
) -> Tuple[jax.Array, jax.Array]:
    """Merge r tokens: (B, S, C) -> (B, S - r, C) with updated sizes.

    Output layout: [kept A tokens (SA - r) | all B tokens (SB)].  Merged
    tokens are folded into their B targets as size-weighted means.
    """
    B, S, C = x.shape
    if sizes is None:
        sizes = jnp.ones((B, S), jnp.float32)
    if metric is None:
        metric = x
    SA = (S + 1) // 2
    SB = S // 2
    src_idx, dst_idx, keep_idx = bipartite_soft_match(metric, r)

    xa, xb = x[:, 0::2], x[:, 1::2]
    sa, sb = sizes[:, 0::2], sizes[:, 1::2]

    # weighted sums: B tokens carry (value * size) until the final divide
    wb = xb.astype(jnp.float32) * sb[..., None]

    src_x = jnp.take_along_axis(
        xa.astype(jnp.float32), src_idx[..., None], axis=1)     # (B, r, C)
    src_s = jnp.take_along_axis(sa, src_idx, axis=1)            # (B, r)

    # scatter-accumulate as a batched one-hot matmul (MXU-friendly; a real
    # scatter serializes on TPU): onehot (B, SB, r) @ (B, r, C)
    onehot = jax.nn.one_hot(dst_idx, SB, dtype=jnp.float32)     # (B, r, SB)
    add_x = jnp.einsum("brk,brc->bkc", onehot, src_x * src_s[..., None])
    add_s = jnp.einsum("brk,br->bk", onehot, src_s)

    new_sb = sb + add_s
    new_xb = ((wb + add_x) / new_sb[..., None]).astype(x.dtype)

    kept_x = jnp.take_along_axis(xa, keep_idx[..., None], axis=1)
    kept_s = jnp.take_along_axis(sa, keep_idx, axis=1)

    out_x = jnp.concatenate([kept_x, new_xb], axis=1)           # (B, S - r, C)
    out_s = jnp.concatenate([kept_s, new_sb], axis=1)
    return out_x, out_s
