"""Int8 weight-only quantization for serving.

Replaces the reference's GGUF/bitsandbytes quantized-inference options
(SURVEY.md §2.3: llama.cpp GGUF quants, one_click.py bitsandbytes) the
TPU way: symmetric per-output-channel int8 with fp scales, stored so XLA
reads int8 from HBM and fuses the dequant into the matmul — decode-step
weight traffic halves versus bf16.

A quantized weight is the dict leaf ``{"q": int8 (in, out), "scale":
f32 (out,)}``; ``matmul_maybe_quant`` dispatches on leaf shape so the same
forward code serves both representations.
"""
from __future__ import annotations

from typing import Dict, Union

import jax
import jax.numpy as jnp

QLeaf = Dict[str, jnp.ndarray]
Weight = Union[jnp.ndarray, QLeaf]

_QUANT_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd", "wqkv", "wgu")


def is_quantized(w: Weight) -> bool:
    return isinstance(w, dict) and "q" in w


def _quant_2d(w: jnp.ndarray) -> QLeaf:
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale[0]}


def quantize_weight(w: jnp.ndarray, axis: int = -2) -> QLeaf:
    """Symmetric per-output-channel int8 over the contraction axis.

    For a (.., in, out) weight the scale is per ``out`` column.  Stacked
    (layers, in, out) weights are quantized one layer slice at a time so the
    fp32 temporaries stay ~100 MB instead of multi-GB (3B weights live on a
    16 GB chip next to the KV cache).
    """
    if w.ndim == 3:
        parts = [_quant_2d(w[i]) for i in range(w.shape[0])]
        return {
            "q": jnp.stack([p["q"] for p in parts]),
            "scale": jnp.stack([p["scale"] for p in parts]),
        }
    assert axis in (-2, w.ndim - 2)
    return _quant_2d(w)


def dequantize_weight(leaf: QLeaf, dtype=jnp.bfloat16, axis: int = -2) -> jnp.ndarray:
    scale = jnp.expand_dims(leaf["scale"], axis)
    return (leaf["q"].astype(jnp.float32) * scale).astype(dtype)


def matmul_maybe_quant(h: jnp.ndarray, w: Weight) -> jnp.ndarray:
    """``h @ w`` supporting plain and int8 leaves (dequant fused by XLA)."""
    if not is_quantized(w):
        return h @ w
    y = h @ w["q"].astype(h.dtype)
    return y * w["scale"].astype(y.dtype)


def matmul_w8a8(h: jnp.ndarray, w: Weight) -> jnp.ndarray:
    """``h @ w`` with int8 ACTIVATIONS as well: per-token symmetric
    quantisation of ``h`` feeding an int8 x int8 MXU dot.

    The weight-only path upcasts the int8 weight into bf16 inside the dot
    (measured 120 TFLOP/s at chunk-prefill shapes on v5e vs 169 w8a8 and
    186 bf16, DECISIONS r4-006) — the upcast halves MXU issue rate.  Used
    on the chunked-prefill hot path (prompt ingestion), where the ~0.4%
    per-dot quantisation noise is amortised over whole-prompt statistics;
    the decode step keeps weight-only dequant (its GEMV is bandwidth-
    bound, so int8 x int8 buys nothing there).  Plain (unquantized)
    weights fall back to the bf16 dot unchanged.
    """
    if not is_quantized(w):
        return h @ w
    hf = h.astype(jnp.float32)
    hsc = jnp.maximum(
        jnp.max(jnp.abs(hf), axis=-1, keepdims=True), 1e-8
    ) / 127.0
    h8 = jnp.clip(jnp.round(hf / hsc), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        h8, w["q"],
        (((h8.ndim - 1,), (w["q"].ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y32.astype(jnp.float32) * hsc * w["scale"]
    return y.astype(h.dtype)


def quantize_params_int8(params: Dict) -> Dict:
    """Quantize the projection matrices, embedding, and lm_head.

    Norm scales stay bf16 (tiny); the embedding is quantized per row so the
    tied lm_head (x @ embed.T) dequantizes per logit column.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for key in _QUANT_KEYS:
        if key in layers and not is_quantized(layers[key]):
            layers[key] = quantize_weight(layers[key], axis=-2)
    out["layers"] = layers
    # embedding: per-row scale, chunked over vocab rows to bound temporaries
    embed = params["embed"]
    chunks = []
    scales = []
    n = embed.shape[0]
    step = max(1, n // 8)
    for lo in range(0, n, step):
        part = embed[lo : lo + step].astype(jnp.float32)
        amax = jnp.max(jnp.abs(part), axis=1, keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-12)
        chunks.append(jnp.clip(jnp.round(part / scale), -127, 127).astype(jnp.int8))
        scales.append(scale[:, 0])
    out["embed"] = {
        "q": jnp.concatenate(chunks, axis=0),
        "scale": jnp.concatenate(scales, axis=0),
    }
    if "lm_head" in params:
        out["lm_head"] = quantize_weight(params["lm_head"], axis=-2)
    return out


def _concat_weights(leaves, axis=-1):
    if is_quantized(leaves[0]):
        return {
            "q": jnp.concatenate([l["q"] for l in leaves], axis=axis),
            "scale": jnp.concatenate([l["scale"] for l in leaves], axis=axis),
        }
    return jnp.concatenate(leaves, axis=axis)


def fuse_layer_weights(params: Dict) -> Dict:
    """Serving-time projection fusion: wq|wk|wv -> wqkv, wg|wu -> wgu.

    One MXU dispatch instead of three (resp. two) per layer; numerics are
    bit-identical since int8 scales are per output column and concatenate
    losslessly.  Training and checkpoints keep the separate canonical
    layout; the engine fuses once at startup (measured ~1.8 ms off the 3B
    decode step on v5e).  Idempotent.
    """
    layers = dict(params["layers"])
    if "wqkv" not in layers:
        layers["wqkv"] = _concat_weights(
            [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")]
        )
    if "wgu" not in layers:
        layers["wgu"] = _concat_weights([layers.pop("wg"), layers.pop("wu")])
    out = dict(params)
    out["layers"] = layers
    return out


def embed_lookup(embed: Weight, tokens: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Token embedding lookup for plain or quantized tables."""
    if not is_quantized(embed):
        return jnp.take(embed, tokens, axis=0)
    rows = jnp.take(embed["q"], tokens, axis=0).astype(jnp.float32)
    scales = jnp.take(embed["scale"], tokens, axis=0)[..., None]
    return (rows * scales).astype(dtype)


def tied_lm_head_logits(x: jnp.ndarray, embed: Weight) -> jnp.ndarray:
    """``x @ embed.T`` for plain or quantized embedding tables."""
    if not is_quantized(embed):
        return (x @ embed.T).astype(jnp.float32)
    y = x @ embed["q"].T.astype(x.dtype)
    return y.astype(jnp.float32) * embed["scale"]  # broadcast over last axis
