"""SNAC codec (decode + encode) as a pure-functional JAX model.

This is a from-scratch TPU-native implementation of the SNAC hierarchical
codec used by the reference stack (loaded from torch in
Morpheus_Client/tts_engine/speechpipe.py:41-43).  Design choices:

- **Layout** is ``(batch, time, channels)`` so channels ride the TPU lane
  dimension; torch SNAC's ``(B, C, T)`` only exists at the converter
  boundary (``weights.py``).
- **Weight-norm is folded** at load time: params hold effective kernels.
- **Transposed convs** are expressed as input-dilated regular convs with
  pre-flipped kernels, so the whole decoder lowers to
  ``lax.conv_general_dilated`` — the op XLA maps onto the MXU.
- **Noise injection** (SNAC's NoiseBlock) takes an explicit PRNG key;
  passing ``None`` zeroes the noise, giving a deterministic decode for
  golden-trace parity tests.

Decoder topology (matches SNAC for config ``snac_24khz``):
    RVQ.from_codes: per-level embed -> 1x1 out_proj -> repeat(stride) -> sum
    Decoder: depthwise conv7 -> 1x1 to decoder_dim
             -> [Snake, ConvT(k=2s, s), Noise, ResUnit(d=1,3,9)] per rate
             -> Snake -> conv7 to 1 channel -> tanh
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .snac_config import SNACConfig

Params = Dict[str, object]


# ---------------------------------------------------------------- primitives


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """1-D convolution on ``(B, T, C)`` with kernel ``(k, in/groups, out)``.

    TPU-fast formulation: XLA's grouped/strided conv lowering is pathological
    on TPU for these audio shapes (measured ~1000x slower than the math
    requires), so convs are expressed as what the hardware actually runs —

    - k==1: a plain matmul (MXU),
    - depthwise (groups == channels): k shifted slice multiply-adds (VPU),
    - dense k>1: k shifted-slice matmuls accumulated (MXU).
    """
    k = w.shape[0]
    if k == 1 and stride == 1 and groups == 1:
        y = x @ w[0]
        return y + b if b is not None else y

    T = x.shape[1]
    t_out = (T + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0))) if padding else x

    depthwise = groups == x.shape[2] and w.shape[1] == 1
    if not depthwise and groups != 1:
        raise NotImplementedError("only depthwise or dense convs are used by SNAC")

    y = None
    for kk in range(k):
        start = kk * dilation
        sl = lax.slice_in_dim(xp, start, start + (t_out - 1) * stride + 1, axis=1)
        if stride > 1:
            sl = sl[:, ::stride]
        contrib = sl * w[kk, 0][None, None, :] if depthwise else sl @ w[kk]
        y = contrib if y is None else y + contrib
    if b is not None:
        y = y + b
    return y


def _shift1(x: jnp.ndarray, offset: int) -> jnp.ndarray:
    """y[t] = x[t + offset] with zero padding out of range."""
    if offset == 0:
        return x
    B, T, C = x.shape
    zeros = jnp.zeros((B, abs(offset), C), x.dtype)
    if offset > 0:
        return jnp.concatenate([x[:, offset:], zeros], axis=1)
    return jnp.concatenate([zeros, x[:, :offset]], axis=1)


def conv_transpose1d(
    x: jnp.ndarray,
    w_flipped: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """Torch-semantics ConvTranspose1d (kernel 2*stride, pad stride/2).

    ``w_flipped`` is the time-flipped (k, in, out) kernel (weights.py).  For
    the even strides SNAC uses (k = 2s, pad = s/2) every output sample
    receives exactly two input contributions, so the op decomposes into four
    MXU matmuls over phase-stacked weight banks — no lhs-dilated conv, which
    XLA lowers catastrophically on TPU.  Odd strides fall back to the
    generic lowering.
    """
    k = w_flipped.shape[0]
    if k != 2 * stride or padding * 2 != stride or stride < 2:
        y = lax.conv_general_dilated(
            x,
            w_flipped,
            window_strides=(1,),
            padding=[(k - 1 - padding, k - 1 - padding)],
            lhs_dilation=(stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype,
        )
        return y + b if b is not None else y

    B, T, c_in = x.shape
    c_out = w_flipped.shape[2]
    s = stride
    half = s // 2
    W = w_flipped[::-1]  # W[j] == original torch weight[:, :, j]

    # phases p < half draw from x[t], x[t-1]; phases p >= half from x[t+1], x[t]
    # with tap indices q = (p + half) % s and q + s (derivation in repo notes)
    A0 = jnp.concatenate([W[(p + half) % s] for p in range(half)], axis=1)
    B0 = jnp.concatenate([W[(p + half) % s + s] for p in range(half)], axis=1)
    A1 = jnp.concatenate([W[(p + half) % s] for p in range(half, s)], axis=1)
    B1 = jnp.concatenate([W[(p + half) % s + s] for p in range(half, s)], axis=1)

    x_m1 = _shift1(x, -1)
    x_p1 = _shift1(x, 1)
    y0 = (x @ A0 + x_m1 @ B0).reshape(B, T, half, c_out)
    y1 = (x_p1 @ A1 + x @ B1).reshape(B, T, s - half, c_out)
    y = jnp.concatenate([y0, y1], axis=2).reshape(B, T * s, c_out)
    if b is not None:
        y = y + b
    return y


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation ``x + sin^2(alpha x) / alpha`` (channelwise alpha)."""
    a = alpha[None, None, :]
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


def _residual_unit(x: jnp.ndarray, p: Params, *, dilation: int, groups: int) -> jnp.ndarray:
    pad = ((7 - 1) * dilation) // 2
    y = snake(x, p["alpha1"])
    y = conv1d(y, p["w1"], p["b1"], padding=pad, dilation=dilation, groups=groups)
    y = snake(y, p["alpha2"])
    y = conv1d(y, p["w2"], p["b2"])
    return x + y


def _noise_block(
    x: jnp.ndarray, p: Params, rng: Optional[jax.Array]
) -> jnp.ndarray:
    h = conv1d(x, p["w"])  # 1x1, no bias
    if rng is None:
        return x
    noise = jax.random.normal(rng, (x.shape[0], x.shape[1], 1), dtype=x.dtype)
    return x + noise * h


# ------------------------------------------------------------------- decoder


def rvq_from_codes(
    params: Params, codes: Sequence[jnp.ndarray], cfg: SNACConfig
) -> jnp.ndarray:
    """RVQ decode: per-level codebook lookup -> out_proj -> upsample -> sum.

    ``codes[i]`` has shape ``(B, T // vq_strides[i] * ... )`` — i.e. the
    coarse level has 1/4 the timeline of the fine level for strides (4,2,1).
    Returns latent ``(B, T_fine, latent_dim)``.
    """
    z = None
    for level, stride in enumerate(cfg.vq_strides):
        q = params["quantizer"][level]
        emb = jnp.take(q["codebook"], codes[level], axis=0)  # (B, Tl, cb_dim)
        zl = conv1d(emb, q["out_w"], q["out_b"])  # 1x1 -> latent
        if stride > 1:
            zl = jnp.repeat(zl, stride, axis=1)
        z = zl if z is None else z + zl
    return z


def snac_decode(
    params: Params,
    codes: Sequence[jnp.ndarray],
    cfg: SNACConfig,
    *,
    noise_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Decode SNAC codes to a waveform ``(B, T_fine * hop_length)``.

    ``codes = (codes0, codes1, codes2)`` with timelines ``n, 2n, 4n`` for the
    24 kHz config.  Deterministic when ``noise_rng`` is None (noise zeroed).
    """
    dec = params["decoder"]
    z = rvq_from_codes(params, codes, cfg)

    if cfg.depthwise:
        x = conv1d(z, dec["in_dw_w"], dec["in_dw_b"], padding=3, groups=cfg.latent)
        x = conv1d(x, dec["in_pw_w"], dec["in_pw_b"])
    else:
        x = conv1d(z, dec["in_w"], dec["in_b"], padding=3)

    rngs: List[Optional[jax.Array]] = [None] * len(cfg.decoder_rates)
    if noise_rng is not None and cfg.noise:
        rngs = list(jax.random.split(noise_rng, len(cfg.decoder_rates)))

    for i, rate in enumerate(cfg.decoder_rates):
        blk = dec["blocks"][i]
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        groups = out_dim if cfg.depthwise else 1
        x = snake(x, blk["alpha_up"])
        x = conv_transpose1d(
            x, blk["up_w"], blk["up_b"], stride=rate, padding=math.ceil(rate / 2)
        )
        if cfg.noise:
            x = _noise_block(x, blk["noise"], rngs[i])
        x = _residual_unit(x, blk["res1"], dilation=1, groups=groups)
        x = _residual_unit(x, blk["res2"], dilation=3, groups=groups)
        x = _residual_unit(x, blk["res3"], dilation=9, groups=groups)

    x = snake(x, dec["alpha_out"])
    x = conv1d(x, dec["out_w"], dec["out_b"], padding=3)
    x = jnp.tanh(x)
    return x[..., 0]  # (B, T_samples)


# ------------------------------------------------------------------- encoder


def _encoder_block(
    x: jnp.ndarray, p: Params, *, stride: int, groups: int
) -> jnp.ndarray:
    x = _residual_unit(x, p["res1"], dilation=1, groups=groups)
    x = _residual_unit(x, p["res2"], dilation=3, groups=groups)
    x = _residual_unit(x, p["res3"], dilation=9, groups=groups)
    x = snake(x, p["alpha_down"])
    x = conv1d(
        x, p["down_w"], p["down_b"], stride=stride, padding=math.ceil(stride / 2)
    )
    return x


def snac_encode(
    params: Params, audio: jnp.ndarray, cfg: SNACConfig
) -> Tuple[jnp.ndarray, ...]:
    """Encode a waveform ``(B, T)`` into RVQ codes (inverse of decode).

    Used for training-data preparation (the reference consumes pre-tokenized
    datasets; this closes the loop natively).  Returns one int32 code array
    per codebook level.
    """
    enc = params["encoder"]
    x = audio[..., None]  # (B, T, 1)
    x = conv1d(x, enc["in_w"], enc["in_b"], padding=3)
    d = cfg.encoder_dim
    for i, rate in enumerate(cfg.encoder_rates):
        d *= 2
        groups = (d // 2) if cfg.depthwise else 1
        x = _encoder_block(x, enc["blocks"][i], stride=rate, groups=groups)
    groups = d if cfg.depthwise else 1
    x = conv1d(x, enc["out_w"], enc["out_b"], padding=3, groups=groups)

    # RVQ encode: residual quantization with strided (avg-pooled) levels.
    codes = []
    residual = x
    for level, stride in enumerate(cfg.vq_strides):
        q = params["quantizer"][level]
        z = residual
        if stride > 1:
            t = (z.shape[1] // stride) * stride
            z = z[:, :t].reshape(z.shape[0], t // stride, stride, z.shape[2]).mean(axis=2)
        zp = conv1d(z, q["in_w"], q["in_b"])  # latent -> cb_dim
        # L2-normalised nearest-neighbour lookup (DAC/SNAC semantics).
        zn = zp / (jnp.linalg.norm(zp, axis=-1, keepdims=True) + 1e-8)
        cb = q["codebook"]
        cbn = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-8)
        dist = zn @ cbn.T  # (B, Tl, codebook_size), cosine similarity
        idx = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        codes.append(idx)
        zq = jnp.take(cb, idx, axis=0)
        zq = conv1d(zq, q["out_w"], q["out_b"])
        if stride > 1:
            zq = jnp.repeat(zq, stride, axis=1)
        residual = residual - zq
    return tuple(codes)
