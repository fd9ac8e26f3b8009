"""PoseVQ: VQ-VAE over SMPL-H body poses, TPU-native.

Capabilities mirror the reference tokenizer (`tokenization/models/
vanilla_pose_vqvae.py`, `quantize_cnn.py`, `resnet.py`) re-designed for JAX:

  * channels-last (B, T, C) conv layout (TPU-friendly; torch uses (B, C, T))
  * the EMA-reset quantizer's codebook/EMA accumulators are EXPLICIT state
    threaded through the train step (the reference mutates registered
    buffers in-place, `quantize_cnn.py:50-72`) — no hidden module state
  * straight-through estimator via stop_gradient
  * the module-level CUDA SMPLH body model of the reference
    (`vanilla_pose_vqvae.py:12-17`) is gone: mesh inference is a separate
    pure function composed by the caller.

Default hyperparameters are the release tokenizer's
(`tokenization/configs/tokenizer_amass_moyo.yaml`): code_dim 256,
2048 codes, width 512, depth 2, dilation rate 3, down_t 1,
token_size_mul 4 / div 4 -> 160 tokens over 21 joints in 6D.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PoseVQConfig:
    """Architecture hyperparameters (ref option_posevq.py:50-68 `ARCH.*`)."""

    num_joints: int = 21
    joint_dim: int = 6              # 6D rotation rep (ROT_TYPE=rot6d)
    code_dim: int = 256             # CODE_DIM
    nb_code: int = 2048             # NB_CODE
    width: int = 512                # WIDTH
    depth: int = 2                  # DEPTH (resnet blocks)
    dilation_growth_rate: int = 3   # DILATION_RATE
    down_t: int = 1                 # DOWN_T
    token_size_mul: int = 4         # TOKEN_SIZE_MUL
    token_size_div: int = 4         # TOKEN_SIZE_DIV
    quantizer: str = "ema_reset"    # QUANTIZER
    mu: float = 0.99                # EMA decay
    beta: float = 1.0               # commit weight for learned quantizer
    dtype: jnp.dtype = jnp.float32

    @property
    def num_tokens(self) -> int:
        # ref `vanilla_pose_vqvae.py:211`
        return ((self.num_joints // 10) * 10) * (2 ** self.token_size_mul) // (
            2 ** self.down_t
        )


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def nearest_resize_1d(x: jax.Array, out_len: int) -> jax.Array:
    """torch nn.Upsample(size=out_len, mode='nearest') on (B, T, C)."""
    in_len = x.shape[1]
    idx = np.floor(np.arange(out_len) * in_len / out_len).astype(np.int32)
    return x[:, idx, :]


class Conv1D(nn.Module):
    """Conv over (B, T, C) matching torch Conv1d(k, s, p, dilation)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            dtype=self.dtype,
            name="conv",
        )(x)


class ResConv1DBlock(nn.Module):
    """Dilated residual block (ref resnet.py:12-69; activation-first, no norm)."""

    width: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = Conv1D(self.width, kernel=3, padding=self.dilation,
                   dilation=self.dilation, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = Conv1D(x.shape[-1], kernel=1, padding=0, dtype=self.dtype, name="conv2")(h)
        return x + h


class Resnet1D(nn.Module):
    """Stack of dilated residual blocks (ref resnet.py:71-81)."""

    width: int
    depth: int
    dilation_growth_rate: int = 3
    reverse_dilation: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dilations = [self.dilation_growth_rate ** d for d in range(self.depth)]
        if self.reverse_dilation:
            dilations = dilations[::-1]
        for i, dil in enumerate(dilations):
            x = ResConv1DBlock(self.width, dil, dtype=self.dtype, name=f"block{i}")(x)
        return x


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

class PoseVQEncoder(nn.Module):
    """(B, 21, 6) pose -> (B, num_tokens, code_dim) latents.

    Ref `vanilla_pose_vqvae.py:42-111` (PoseSPEncoderV1): conv -> upsample to
    40 -> (mul-1) x nearest-double+conv -> down_t strided conv + resnet ->
    project to code_dim.  The reference's in-module training-noise injection
    (`:96-104`) is a data-side concern here; apply `add_noise_curriculum`
    before calling.
    """

    cfg: PoseVQConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = c.dtype
        x = Conv1D(c.width, dtype=dt, name="in_conv")(x)
        x = nn.relu(x)
        base_len = ((c.num_joints * 2) // 10) * 10  # 21 -> 40
        x = nearest_resize_1d(x, base_len)
        x = Conv1D(c.width, dtype=dt, name="base_conv")(x)
        x = nn.relu(x)
        for i in range(c.token_size_mul - 1):
            x = nearest_resize_1d(x, x.shape[1] * 2)
            x = Conv1D(c.width, dtype=dt, name=f"up_conv{i}")(x)
            x = nn.relu(x)
        for i in range(c.down_t):
            x = Conv1D(c.width, kernel=4, stride=2, padding=1, dtype=dt,
                       name=f"down_conv{i}")(x)
            x = Resnet1D(c.width, c.depth, c.dilation_growth_rate,
                         dtype=dt, name=f"down_res{i}")(x)
        x = Conv1D(c.code_dim, dtype=dt, name="out_conv")(x)
        return x


class PoseVQDecoder(nn.Module):
    """(B, num_tokens, code_dim) -> (B, 21, 6) pose 6D.

    Ref `vanilla_pose_vqvae.py:113-193` (PoseSPDecoderV1): conv -> staged
    nearest-downsample through np.linspace(21, T, div, endpoint=False)[::-1]
    -> down_t x (resnet reverse-dilated + conv) -> project to 6.
    """

    cfg: PoseVQConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = c.dtype
        x = Conv1D(c.width, dtype=dt, name="in_conv")(x)
        x = nn.relu(x)
        sizes = list(
            np.linspace(c.num_joints, c.num_tokens, c.token_size_div,
                        endpoint=False, dtype=int)[::-1]
        )
        for i, s in enumerate(sizes):
            x = nearest_resize_1d(x, int(s))
            x = Conv1D(c.width, dtype=dt, name=f"up_conv{i}")(x)
            x = nn.relu(x)
        for i in range(c.down_t):
            x = Resnet1D(c.width, c.depth, c.dilation_growth_rate,
                         reverse_dilation=True, dtype=dt, name=f"up_res{i}")(x)
            x = Conv1D(c.width, dtype=dt, name=f"res_conv{i}")(x)
        x = Conv1D(c.joint_dim, dtype=dt, name="out_conv")(x)
        return x


# ---------------------------------------------------------------------------
# EMA-reset vector quantizer (functional state)
# ---------------------------------------------------------------------------

class VQState(NamedTuple):
    """Explicit quantizer state (ref buffers in quantize_cnn.py:14-36)."""

    codebook: jax.Array    # (K, D)
    code_sum: jax.Array    # (K, D) EMA numerator
    code_count: jax.Array  # (K,)   EMA denominator
    initialized: jax.Array  # () bool — codebook bootstrapped from data?


def vq_init_state(cfg: PoseVQConfig) -> VQState:
    K, D = cfg.nb_code, cfg.code_dim
    return VQState(
        codebook=jnp.zeros((K, D), jnp.float32),
        code_sum=jnp.zeros((K, D), jnp.float32),
        code_count=jnp.ones((K,), jnp.float32),
        initialized=jnp.asarray(False),
    )


def _tile_to_codebook(x: jax.Array, nb_code: int, rng: jax.Array) -> jax.Array:
    """Repeat batch vectors (+ small noise when repeating) and take nb_code.

    Ref `quantize_cnn.py:20-29` (_tile).  x: (N, D) with N static.
    """
    N, D = x.shape
    if N < nb_code:
        n_rep = (nb_code + N - 1) // N
        std = 0.01 / np.sqrt(D)
        out = jnp.tile(x, (n_rep, 1))
        out = out + jax.random.normal(rng, out.shape, x.dtype) * std
    else:
        out = x
    return out[:nb_code]


def vq_quantize(codebook: jax.Array, x: jax.Array) -> jax.Array:
    """Nearest-code indices for (N, D) vectors (ref quantize_cnn.py:80-86).

    One (N, D)x(D, K) matmul on the MXU + rowwise norms.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    k2 = jnp.sum(codebook * codebook, axis=-1)
    xk = jnp.dot(x, codebook.T, preferred_element_type=jnp.float32)
    dist = x2 - 2.0 * xk + k2[None, :]
    return jnp.argmin(dist, axis=-1)


def vq_dequantize(codebook: jax.Array, code_idx: jax.Array) -> jax.Array:
    return jnp.take(codebook, code_idx, axis=0)


def vq_dequantize_logits(codebook: jax.Array, logits: jax.Array) -> jax.Array:
    """Soft dequantization: (..., K) simplex weights @ (K, D) codebook.

    The differentiable path TokenHMR's head relies on
    (ref quantize_cnn.py:92-93).
    """
    return jnp.matmul(logits, codebook, preferred_element_type=jnp.float32)


def _perplexity(code_idx: jax.Array, nb_code: int) -> jax.Array:
    counts = jnp.zeros((nb_code,), jnp.float32).at[code_idx].add(1.0)
    prob = counts / jnp.sum(counts)
    return jnp.exp(-jnp.sum(prob * jnp.log(prob + 1e-7)))


def vq_ema_reset_forward(
    state: VQState,
    x: jax.Array,                 # (N, D) flat latents
    rng: jax.Array,
    mu: float = 0.99,
    training: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, VQState]:
    """EMA-reset VQ forward (ref quantize_cnn.py:95-130).

    Returns (quantized (N, D) straight-through, commit_loss, perplexity,
    new_state).  In eval mode state passes through unchanged.
    """
    N, D = x.shape
    K = state.codebook.shape[0]
    rng_init, rng_reset = jax.random.split(rng)

    if training:
        # bootstrap codebook from the first batch (ref init_codebook :31-36)
        def do_init(s: VQState) -> VQState:
            cb = _tile_to_codebook(x, K, rng_init)
            return VQState(cb, cb, jnp.ones((K,), jnp.float32), jnp.asarray(True))

        state = jax.lax.cond(state.initialized, lambda s: s, do_init, state)

    code_idx = vq_quantize(state.codebook, x)
    x_d = vq_dequantize(state.codebook, code_idx)

    if training:
        # EMA update + dead-code reset (ref update_codebook :50-72)
        onehot_sum = jnp.zeros((K,), jnp.float32).at[code_idx].add(1.0)
        code_sum_batch = (
            jnp.zeros((K, D), jnp.float32).at[code_idx].add(x.astype(jnp.float32))
        )
        code_rand = _tile_to_codebook(x, K, rng_reset)
        new_sum = mu * state.code_sum + (1.0 - mu) * code_sum_batch
        new_count = mu * state.code_count + (1.0 - mu) * onehot_sum
        usage = (new_count >= 1.0)[:, None]
        code_update = new_sum / new_count[:, None]
        new_codebook = jnp.where(usage, code_update, code_rand)
        prob = onehot_sum / jnp.sum(onehot_sum)
        perplexity = jnp.exp(-jnp.sum(prob * jnp.log(prob + 1e-7)))
        new_state = VQState(new_codebook, new_sum, new_count, state.initialized)
    else:
        perplexity = _perplexity(code_idx, K)
        new_state = state

    commit_loss = jnp.mean((x - jax.lax.stop_gradient(x_d)) ** 2)
    # straight-through estimator
    x_out = x + jax.lax.stop_gradient(x_d - x)
    return x_out, commit_loss, perplexity, new_state


# ---------------------------------------------------------------------------
# Other quantizer variants (ref quantize_cnn.py:134-420).  The released
# tokenizer uses ema_reset; these complete the QUANTIZER config surface.
# ---------------------------------------------------------------------------

def vq_learned_forward(
    codebook: jax.Array,          # (K, D) — a TRAINABLE param (gets grads)
    x: jax.Array,                 # (N, D)
    beta: float = 1.0,
    training: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """'orig' learned-embedding quantizer (ref `Quantizer`, :134-196):
    loss = ||sg[x] - e||^2 + beta * ||x - sg[e]||^2, straight-through."""
    code_idx = vq_quantize(codebook, x)
    x_d = vq_dequantize(codebook, code_idx)
    loss = jnp.mean((jax.lax.stop_gradient(x) - x_d) ** 2) \
        + beta * jnp.mean((x - jax.lax.stop_gradient(x_d)) ** 2)
    x_out = x + jax.lax.stop_gradient(x_d - x)
    perplexity = _perplexity(code_idx, codebook.shape[0])
    return x_out, loss, perplexity


def vq_ema_forward(
    state: VQState, x: jax.Array, rng: jax.Array,
    mu: float = 0.99, training: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, VQState]:
    """'ema' variant (ref `QuantizeEMA`, :308-420): EMA update WITHOUT the
    dead-code random reset."""
    N, D = x.shape
    K = state.codebook.shape[0]
    if training:
        def do_init(s: VQState) -> VQState:
            cb = _tile_to_codebook(x, K, rng)
            return VQState(cb, cb, jnp.ones((K,), jnp.float32), jnp.asarray(True))
        state = jax.lax.cond(state.initialized, lambda s: s, do_init, state)
    code_idx = vq_quantize(state.codebook, x)
    x_d = vq_dequantize(state.codebook, code_idx)
    if training:
        onehot_sum = jnp.zeros((K,), jnp.float32).at[code_idx].add(1.0)
        code_sum_batch = jnp.zeros((K, D), jnp.float32).at[code_idx].add(
            x.astype(jnp.float32))
        new_sum = mu * state.code_sum + (1 - mu) * code_sum_batch
        new_count = mu * state.code_count + (1 - mu) * onehot_sum
        new_codebook = new_sum / jnp.maximum(new_count[:, None], 1e-6)
        prob = onehot_sum / jnp.sum(onehot_sum)
        perplexity = jnp.exp(-jnp.sum(prob * jnp.log(prob + 1e-7)))
        new_state = VQState(new_codebook, new_sum, new_count, state.initialized)
    else:
        perplexity = _perplexity(code_idx, K)
        new_state = state
    commit = jnp.mean((x - jax.lax.stop_gradient(x_d)) ** 2)
    return x + jax.lax.stop_gradient(x_d - x), commit, perplexity, new_state


def vq_reset_forward(
    state: VQState, x: jax.Array, rng: jax.Array, training: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, VQState]:
    """'reset' variant (ref `QuantizeReset`, :200-305): per-batch codebook =
    mean of assigned vectors, unused codes reset to random batch vectors."""
    N, D = x.shape
    K = state.codebook.shape[0]
    if training:
        def do_init(s: VQState) -> VQState:
            cb = _tile_to_codebook(x, K, rng)
            return VQState(cb, cb, jnp.ones((K,), jnp.float32), jnp.asarray(True))
        state = jax.lax.cond(state.initialized, lambda s: s, do_init, state)
    code_idx = vq_quantize(state.codebook, x)
    x_d = vq_dequantize(state.codebook, code_idx)
    if training:
        onehot_sum = jnp.zeros((K,), jnp.float32).at[code_idx].add(1.0)
        code_sum_batch = jnp.zeros((K, D), jnp.float32).at[code_idx].add(
            x.astype(jnp.float32))
        code_rand = _tile_to_codebook(x, K, rng)
        usage = (onehot_sum >= 1.0)[:, None]
        new_codebook = jnp.where(
            usage, code_sum_batch / jnp.maximum(onehot_sum[:, None], 1e-6),
            code_rand)
        prob = onehot_sum / jnp.sum(onehot_sum)
        perplexity = jnp.exp(-jnp.sum(prob * jnp.log(prob + 1e-7)))
        new_state = VQState(new_codebook, state.code_sum, onehot_sum,
                            state.initialized)
    else:
        perplexity = _perplexity(code_idx, K)
        new_state = state
    commit = jnp.mean((x - jax.lax.stop_gradient(x_d)) ** 2)
    return x + jax.lax.stop_gradient(x_d - x), commit, perplexity, new_state


QUANTIZER_FORWARDS = {
    "ema_reset": vq_ema_reset_forward,
    "ema": vq_ema_forward,
    "reset": vq_reset_forward,
}


# ---------------------------------------------------------------------------
# Top-level tokenizer
# ---------------------------------------------------------------------------

class PoseVQ(nn.Module):
    """Encoder+decoder module; the quantizer state is threaded by the caller.

    Mirrors `VanillaTokenizer` (ref vanilla_pose_vqvae.py:195-255) minus the
    in-module body model and buffer mutation.
    """

    cfg: PoseVQConfig

    def setup(self):
        self.encoder = PoseVQEncoder(self.cfg, name="encoder")
        self.decoder = PoseVQDecoder(self.cfg, name="decoder")

    def encode_latents(self, pose_6d: jax.Array) -> jax.Array:
        """(B, 21, 6) -> (B, T, D) continuous latents."""
        return self.encoder(pose_6d)

    def decode_latents(self, z: jax.Array) -> jax.Array:
        """(B, T, D) -> (B, 21, 6) pose."""
        return self.decoder(z)

    def __call__(self, pose_6d: jax.Array) -> jax.Array:
        """Non-quantized autoencoder pass (used for init/shape inference)."""
        return self.decoder(self.encoder(pose_6d))


def posevq_encode(
    params, cfg: PoseVQConfig, vq_state: VQState, pose_6d: jax.Array
) -> jax.Array:
    """(B, 21, 6) -> (B, T) code indices (ref VanillaTokenizer.encode :234-242)."""
    model = PoseVQ(cfg)
    z = model.apply(params, pose_6d, method=PoseVQ.encode_latents)
    B, T, D = z.shape
    idx = vq_quantize(vq_state.codebook, z.reshape(B * T, D))
    return idx.reshape(B, T)


def posevq_decode_indices(
    params, cfg: PoseVQConfig, vq_state: VQState, code_idx: jax.Array
) -> jax.Array:
    """(B, T) indices -> (B, 21, 6) pose."""
    z = vq_dequantize(vq_state.codebook, code_idx)
    return PoseVQ(cfg).apply(params, z, method=PoseVQ.decode_latents)


def posevq_decode_logits(
    params, cfg: PoseVQConfig, vq_state: VQState, logits_softmax: jax.Array
) -> jax.Array:
    """(B, T, K) simplex -> (B, 21, 6) pose.

    The frozen-decoder path used inside TokenHMR's head
    (ref `DecodeTokens.forward`, vanilla_pose_vqvae.py:294-297).
    """
    z = vq_dequantize_logits(vq_state.codebook, logits_softmax)
    return PoseVQ(cfg).apply(params, z, method=PoseVQ.decode_latents)


def posevq_forward_train(
    params,
    cfg: PoseVQConfig,
    vq_state: VQState,
    pose_6d: jax.Array,
    rng: jax.Array,
    training: bool = True,
):
    """Full VQ-VAE pass: encode -> quantize (EMA update) -> decode.

    Returns (pred_pose_6d, commit_loss, perplexity, new_vq_state).
    Ref `VanillaTokenizer.forward` (:244-255).
    """
    model = PoseVQ(cfg)
    model_vars = params
    if cfg.quantizer == "orig":
        # 'orig' = learned-embedding quantizer: the codebook is a TRAINABLE
        # leaf carried at params["codebook"] (gets gradients + weight decay,
        # like the reference's nn.Embedding, quantize_cnn.py:142-143); the
        # EMA vq_state only mirrors it for deploy-time encode/decode
        model_vars = {k: v for k, v in params.items() if k != "codebook"}
    z = model.apply(model_vars, pose_6d, method=PoseVQ.encode_latents)
    B, T, D = z.shape
    zf = z.reshape(B * T, D)
    if cfg.quantizer == "orig":
        cb = params["codebook"]
        zq, commit, perp = vq_learned_forward(cb, zf, training=training)
        new_state = vq_state._replace(
            codebook=jax.lax.stop_gradient(cb), initialized=jnp.asarray(True))
    elif cfg.quantizer == "reset":
        zq, commit, perp, new_state = vq_reset_forward(
            vq_state, zf, rng, training=training)
    elif cfg.quantizer == "ema":
        zq, commit, perp, new_state = vq_ema_forward(
            vq_state, zf, rng, mu=cfg.mu, training=training)
    elif cfg.quantizer == "ema_reset":
        zq, commit, perp, new_state = vq_ema_reset_forward(
            vq_state, zf, rng, mu=cfg.mu, training=training)
    else:
        raise ValueError(f"unknown quantizer {cfg.quantizer!r} "
                         "(expected ema_reset | ema | reset | orig)")
    pred = model.apply(model_vars, zq.reshape(B, T, D), method=PoseVQ.decode_latents)
    return pred, commit, perp, new_state


def init_learned_codebook(rng: jax.Array, cfg: PoseVQConfig) -> jax.Array:
    """uniform(-1/K, 1/K) init for the 'orig' trainable codebook
    (ref quantize_cnn.py:142-143)."""
    K = cfg.nb_code
    return jax.random.uniform(rng, (K, cfg.code_dim), jnp.float32,
                              -1.0 / K, 1.0 / K)


# ---------------------------------------------------------------------------
# Training-noise curriculum (data-side; ref encoder :96-104 + skeleton.py)
# ---------------------------------------------------------------------------

SMPLX_BODY_PARTS = {
    # 5 groups over the 21 body joints, root-EXCLUDED indexing
    # (ref tokenization/utils/skeleton.py:1-8, verbatim)
    0: [11, 14],                    # head
    1: [12, 15, 17, 19],            # left arm
    2: [13, 16, 18, 20],            # right arm
    3: [0, 3, 6, 9],                # left leg
    4: [1, 4, 7, 10],               # right leg
}


def noise_multiplier_for_step(step: int) -> float:
    """Curriculum schedule (ref vanilla_pose_vqvae.py:19-22)."""
    table = {0: 1e-2, 1: 5e-2, 2: 1e-1, 3: 1e-1, 4: 5e-1, 5: 5e-1}
    k = step // 5000
    return float(table[k]) if k <= 5 else 0.5


def add_noise_curriculum(
    pose_6d: jax.Array, rng: jax.Array, step: int
) -> jax.Array:
    """Add uniform noise to one random body-part group on half the batch.

    Pure re-expression of the reference's in-place encoder noise
    (`vanilla_pose_vqvae.py:96-104`).
    """
    mult = noise_multiplier_for_step(step)
    B = pose_6d.shape[0]
    r_samples, r_part, r_noise = jax.random.split(rng, 3)
    sample_mask = jnp.zeros((B,), bool).at[
        jax.random.randint(r_samples, (B // 2,), 0, max(B - 1, 1))
    ].set(True)
    part = jax.random.randint(r_part, (), 0, len(SMPLX_BODY_PARTS))
    joint_mask = jnp.zeros((pose_6d.shape[1],), bool)
    for k, joints in SMPLX_BODY_PARTS.items():
        in_part = jnp.zeros((pose_6d.shape[1],), bool).at[jnp.asarray(joints)].set(True)
        joint_mask = jnp.where(part == k, in_part, joint_mask)
    noise = jax.random.uniform(r_noise, ()) * mult
    mask = sample_mask[:, None, None] & joint_mask[None, :, None]
    return pose_6d + jnp.where(mask, noise, 0.0)
