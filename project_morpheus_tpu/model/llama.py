"""Llama-3.2-class decoder forward in functional JAX.

Replaces the reference's native decode engines (llama.cpp GGUF,
Morpheus_Client/tts_engine/llama_local.py:38-87; vLLM,
orpheus_tts_pypi/orpheus_tts/engine_class.py:60-134) with a TPU-first
design:

- Parameters are **layer-stacked** pytrees and the forward runs
  ``lax.scan`` over layers: one traced layer body regardless of depth,
  fast compiles, and clean pjit sharding (layer axis is never sharded).
- Two entry points share weights: ``llama_forward`` (full-sequence, used
  for training and prefill) and ``llama_decode_step`` (single token per
  slot against a dense KV cache) — the decode step is the serving hot loop.
- The KV cache is a slot table (bf16: ``[L, slots, KV, S, HD]``
  head-major; int8: ``[L, slots, S, KV*HD]`` position-major flat — see
  init_kv_cache) so continuous batching (admission/eviction = barge-in)
  touches only the slot dimension.
- All matmuls stay bf16 on the MXU with fp32 softmax/norm accumulators.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .config import LlamaConfig
from .quant import (
    embed_lookup,
    matmul_maybe_quant,
    matmul_w8a8,
    tied_lm_head_logits,
)

Params = Dict[str, object]
KVCache = Dict[str, jnp.ndarray]


# ------------------------------------------------------------------ helpers


def rmsnorm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps)).astype(dt) * scale


def rope_inv_freqs(cfg: LlamaConfig) -> jnp.ndarray:
    """Inverse RoPE frequencies with llama-3 long-context scaling."""
    d = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if cfg.rope_scaling_factor == 1.0:
        return inv
    low_wl = cfg.rope_original_max_pos / cfg.rope_low_freq_factor
    high_wl = cfg.rope_original_max_pos / cfg.rope_high_freq_factor
    wavelen = 2.0 * math.pi / inv
    smooth = (cfg.rope_original_max_pos / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
    )
    scaled = jnp.where(
        wavelen < high_wl,
        inv,
        jnp.where(
            wavelen > low_wl,
            inv / cfg.rope_scaling_factor,
            (1.0 - smooth) * inv / cfg.rope_scaling_factor + smooth * inv,
        ),
    )
    return scaled


def apply_rope(
    x: jnp.ndarray, positions: jnp.ndarray, inv_freqs: jnp.ndarray
) -> jnp.ndarray:
    """Rotate ``x`` of shape (B, S, H, D) by per-token ``positions`` (B, S)."""
    angles = positions[..., None].astype(jnp.float32) * inv_freqs  # (B, S, D/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


# --------------------------------------------------------------------- init


def init_llama_params(
    cfg: LlamaConfig, key: jax.Array, dtype: Optional[jnp.dtype] = None
) -> Params:
    dt = dtype or jnp.dtype(cfg.dtype)
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, KV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    Vp = cfg.padded_vocab
    ks = jax.random.split(key, 10)

    def normal(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    params: Params = {
        "embed": normal(ks[0], (Vp, D), 0.02),
        "layers": {
            "ln1": jnp.ones((L, D), dt),
            "wq": normal(ks[1], (L, D, H * HD), D**-0.5),
            "wk": normal(ks[2], (L, D, KV * HD), D**-0.5),
            "wv": normal(ks[3], (L, D, KV * HD), D**-0.5),
            "wo": normal(ks[4], (L, H * HD, D), (H * HD) ** -0.5),
            "ln2": jnp.ones((L, D), dt),
            "wg": normal(ks[5], (L, D, F), D**-0.5),
            "wu": normal(ks[6], (L, D, F), D**-0.5),
            "wd": normal(ks[7], (L, F, D), F**-0.5),
        },
        "ln_f": jnp.ones((D,), dt),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = normal(ks[8], (D, Vp), D**-0.5)
    return params


def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: Optional[int] = None, dtype=jnp.bfloat16
) -> KVCache:
    """Slot-table KV cache, laid out ``(L, slots, kv_heads, max_seq, head_dim)``.

    The kv-head axis sits OUTSIDE the TPU-tiled trailing dims so per-head
    cache streams are contiguous and Mosaic DMA slices stay tile-aligned.

    ``dtype=int8`` allocates a QUANTIZED cache: int8 payload plus an fp32
    scale per (layer, slot, head, position) — long-context decode is
    KV-bandwidth-bound (8 slots x 8192 bf16 for the 3B reads 7.5 GB per
    step), so halving the payload nearly halves the step at 8k.  Writes
    quantize per position (max-abs/127); attention dequantises in
    registers (scores scale by the k scales, probs by the v scales).

    LAYOUT (int8 only): payload ``(L, slots, max_seq, kv_heads*head_dim)``
    — position-major with a FLAT head-x-dim minor axis — and one combined
    scale array ``(L, slots, max_seq, 2*kv_heads)`` holding the k scales
    in lanes ``[:KV]`` and the v scales in ``[KV:]``.  Position-major
    because int8 sub-byte tiling cannot update a single position in place
    in the head-major layout (XLA relaid the ENTIRE donated cache every
    decode step, +3 ms/step at 8k — DECISIONS r4-005); FLAT because the
    slot attention kernel takes the carried cache as an ALIASED pallas
    operand and a reshape at that boundary defeats donation (a multi-GB
    copy per layer, measured — DECISIONS r5-002).  The bf16 cache keeps
    the r1-001 head-major layout, which it tiles and updates in place
    natively.
    """
    S = max_len or cfg.max_seq_len
    if jnp.dtype(dtype) == jnp.int8:
        # FLAT head-x-dim minor axis (KV*HD): the slot attention kernel
        # takes the carried cache as an ALIASED pallas operand, and a
        # reshape at that boundary defeats buffer donation — XLA then
        # copies the multi-GB cache every layer (measured 26 ms/layer,
        # DECISIONS r5).  Writers/readers reshape their SMALL values.
        qshape = (
            cfg.num_layers, batch, S, cfg.num_kv_heads * cfg.head_dim
        )
        return {
            "k": jnp.zeros(qshape, jnp.int8),
            "v": jnp.zeros(qshape, jnp.int8),
            "scale": jnp.zeros(
                (cfg.num_layers, batch, S, 2 * cfg.num_kv_heads), jnp.float32
            ),
        }
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, S, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def kv_cache_is_quantized(cache: KVCache) -> bool:
    return "scale" in cache


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-position symmetric int8: returns (int8 payload, fp32 scale).

    ``x`` has head_dim last; the scale drops that axis.
    """
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


# ------------------------------------------------------------------ forward


def lm_head_logits(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    """Final-hidden -> fp32 logits (tied-embedding or separate lm_head).

    Shared by the full forward and the chunked-vocab training loss, which
    applies it per sequence chunk so the (S, padded_vocab) logits tensor
    never materialises whole.
    """
    head = params.get("lm_head")
    if head is None:
        return tied_lm_head_logits(h, params["embed"])
    return matmul_maybe_quant(h, head).astype(jnp.float32)


def _split_heads(x: jnp.ndarray, n: int, hd: int) -> jnp.ndarray:
    return x.reshape(*x.shape[:-1], n, hd)


def _constrain_batch_to_data(x: jnp.ndarray) -> jnp.ndarray:
    """Pin a (B, ...) activation's batch axis to the mesh ``data`` axis.

    Under the fsdp/fsdp_tp param shardings the weights' hidden dims are
    sharded over ``data`` (ZeRO-3 storage); without an explicit
    activation constraint GSPMD resolves the conflicting contraction by
    UNSHARDING the batch — every device then carries the full global
    batch's activations (measured: bf16(8,8192,F/2) temps per device and
    a compile-time HBM OOM on v5e:2x4, DECISIONS r5).  Constraining the
    batch per layer makes XLA all-gather the (smaller) weights instead —
    exactly FSDP semantics.  No-op when tracing without a mesh context
    or on meshes without a ``data`` axis.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or "data" not in dict(mesh.shape):
            return x
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, P("data", *([None] * (x.ndim - 1)))
        )
    except Exception:
        return x


def _attn_full(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, S, KV, D)
    v: jnp.ndarray,
    mask: jnp.ndarray,  # (B, S, S) additive or bool
    cfg: LlamaConfig,
) -> jnp.ndarray:
    G = cfg.num_heads // cfg.num_kv_heads
    B, S = q.shape[0], q.shape[1]
    qg = q.reshape(B, S, cfg.num_kv_heads, G, cfg.head_dim)
    scores = jnp.einsum(
        "bqkgd,bskd->bkgqs", qg, k, preferred_element_type=jnp.float32
    ) * (cfg.head_dim**-0.5)
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgqs,bskd->bqkgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, S, cfg.num_heads * cfg.head_dim).astype(q.dtype)


def _train_layer(x, wl, positions, inv_freqs, attn_mask, mask, cfg, attn_impl):
    """One decoder layer (full-finetune path, no LoRA) — module-level so
    the gradient-accumulating custom-vjp stack below can re-apply it."""
    x = _constrain_batch_to_data(x)
    B, S = x.shape[:2]
    h = rmsnorm(x, wl["ln1"], cfg.rms_eps)
    q, k, v = _project_qkv(h, wl, cfg)
    q = apply_rope(q, positions, inv_freqs)
    k = apply_rope(k, positions, inv_freqs)
    if attn_impl == "blockwise":
        from ..ops.blockwise_attention import blockwise_causal_attention

        attn = blockwise_causal_attention(q, k, v, attn_mask).reshape(
            B, S, cfg.num_heads * cfg.head_dim
        )
    else:
        attn = _attn_full(q, k, v, mask, cfg)
    x = x + matmul_maybe_quant(attn, wl["wo"])
    h = rmsnorm(x, wl["ln2"], cfg.rms_eps)
    return x + _mlp(h, wl, cfg)


def _f0_like(a):
    """float0 cotangent for integer/bool primals (custom_vjp contract)."""
    import numpy as _np

    if a is None:
        return None
    return _np.zeros(a.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def stack_apply_accum(cfg, attn_impl, lp, x, positions, inv_freqs,
                      attn_mask, mask):
    """Layer stack with a CARRY-accumulated backward.

    ``lax.scan`` transposes gradients w.r.t. its scanned-over inputs (the
    stacked layer weights) into per-iteration scan OUTPUTS, and XLA
    double-buffers while-loop outputs — keeping TWO copies of the full
    stacked layer gradients live (+3.9 GB at 3B bf16; the single-chip
    seq-8192 OOM margin, see DECISIONS r3-010).  This custom-vjp stack
    saves only the per-layer boundary activations in the forward and, in
    the backward, scans the layers in REVERSE carrying (dx, grad_accum):
    each layer's weight gradient is written into the carried accumulator
    with an in-place ``dynamic_update_slice`` — carries alias, outputs
    double-buffer, so peak gradient memory is ONE stacked copy.  The
    layer forward is recomputed inside the backward (``jax.vjp``), which
    subsumes per-layer remat.
    """

    def body(x, wl):
        return (
            _train_layer(x, wl, positions, inv_freqs, attn_mask, mask,
                         cfg, attn_impl),
            None,
        )

    x, _ = lax.scan(body, x, lp)
    return x


def _stack_apply_accum_fwd(cfg, attn_impl, lp, x, positions, inv_freqs,
                           attn_mask, mask):
    def body(x, wl):
        x2 = _train_layer(x, wl, positions, inv_freqs, attn_mask, mask,
                          cfg, attn_impl)
        return x2, x  # save this layer's INPUT boundary

    x_out, xs = lax.scan(body, x, lp)
    return x_out, (lp, xs, positions, inv_freqs, attn_mask, mask)


def _stack_apply_accum_bwd(cfg, attn_impl, res, dx):
    lp, xs, positions, inv_freqs, attn_mask, mask = res
    L = jax.tree.leaves(lp)[0].shape[0]
    gacc = jax.tree.map(jnp.zeros_like, lp)

    def body(carry, inp):
        dx, gacc = carry
        i, wl, x_in = inp

        def f(w, xi):
            return _train_layer(xi, w, positions, inv_freqs, attn_mask,
                                mask, cfg, attn_impl)

        _, vjp = jax.vjp(f, wl, x_in)
        dwl, dxi = vjp(dx)
        gacc = jax.tree.map(
            lambda g, d: lax.dynamic_update_slice(
                g, d.astype(g.dtype)[None], (i,) + (0,) * d.ndim
            ),
            gacc,
            dwl,
        )
        return (dxi, gacc), None

    (dx0, gacc), _ = lax.scan(
        body, (dx, gacc), (jnp.arange(L), lp, xs), reverse=True
    )
    return (
        gacc,
        dx0,
        _f0_like(positions),
        jnp.zeros_like(inv_freqs),
        _f0_like(attn_mask),
        _f0_like(mask),
    )


stack_apply_accum.defvjp(_stack_apply_accum_fwd, _stack_apply_accum_bwd)


def llama_forward(
    params: Params,
    tokens: jnp.ndarray,  # (B, S) int32
    cfg: LlamaConfig,
    *,
    positions: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,  # (B, S) padding mask, True=real
    cache: Optional[KVCache] = None,
    cache_offset: Optional[jnp.ndarray] = None,  # (B,) write offsets
    cache_slots: Optional[jnp.ndarray] = None,   # (B,) cache lanes to write
    lora: Optional[Params] = None,  # low-rank adapters (training/lora.py)
    lora_scale: float = 1.0,
    attn_impl: str = "dense",  # "dense" | "blockwise" (O(S*block) memory)
    remat: bool = False,  # rematerialise each layer in the backward pass
    return_hidden: bool = False,  # skip the lm head; return (B, S, D)
    scan_layers: bool = True,  # False: python-unrolled layer loop — the
    # lax.scan backward double-buffers its per-layer gradient accumulators
    # (~2x the stacked layer grads, +4 GB at 3B bf16); unrolling keeps a
    # single accumulator at the cost of a larger program (the single-chip
    # seq-8192 training posture)
    accum_stack_grads: bool = False,  # carry-accumulated backward through
    # the layer stack (stack_apply_accum): ONE stacked-gradient copy and
    # implicit per-layer remat — the single-chip long-seq training posture
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Full-sequence forward (training / prefill).

    Returns logits ``(B, S, padded_vocab)`` in fp32 — or, with
    ``return_hidden``, the final normed hidden states ``(B, S, D)`` for a
    chunked lm-head application — and, when ``cache`` is given, the cache
    with this sequence's K/V written at ``cache_offset``.
    """
    B, S = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    if attn_mask is None:
        attn_mask = jnp.ones((B, S), bool)
    if attn_impl == "blockwise":
        # the blockwise kernel derives causality from block indices and
        # takes the (B, S) padding mask directly; materialising the dense
        # (B, S, S) mask anyway costs 2 GiB at batch 8 / seq 8192 and
        # rides the remat residuals — the single biggest avoidable
        # allocation in the 8-device seq-8192 recipe (DECISIONS r5)
        mask = None
    else:
        causal = jnp.tril(jnp.ones((S, S), bool))
        mask = causal[None] & attn_mask[:, None, :]

    inv_freqs = rope_inv_freqs(cfg)
    x = embed_lookup(params["embed"], tokens, dtype=params["ln_f"].dtype)

    lp = params["layers"]
    write_off = cache_offset if cache_offset is not None else jnp.zeros((B,), jnp.int32)

    def proj(h, wl, ll, name):
        """x @ W plus optional low-rank delta scale * (x @ A) @ B."""
        y = matmul_maybe_quant(h, wl[name])
        if ll is not None and name in ll:
            a, b = ll[name]["a"], ll[name]["b"]
            y = y + lora_scale * ((h @ a) @ b).astype(y.dtype)
        return y

    def layer(x, scanned):
        x = _constrain_batch_to_data(x)
        wl, ll = scanned if lora is not None else (scanned, None)
        h = rmsnorm(x, wl["ln1"], cfg.rms_eps)
        if ll is None:
            q, k, v = _project_qkv(h, wl, cfg)  # fused-aware (serving)
        else:
            q = _split_heads(proj(h, wl, ll, "wq"), cfg.num_heads, cfg.head_dim)
            k = _split_heads(proj(h, wl, ll, "wk"), cfg.num_kv_heads, cfg.head_dim)
            v = _split_heads(proj(h, wl, ll, "wv"), cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, positions, inv_freqs)
        k = apply_rope(k, positions, inv_freqs)
        if attn_impl == "blockwise":
            from ..ops.blockwise_attention import blockwise_causal_attention

            attn = blockwise_causal_attention(q, k, v, attn_mask).reshape(
                B, S, cfg.num_heads * cfg.head_dim
            )
        else:
            attn = _attn_full(q, k, v, mask, cfg)
        x = x + proj(attn, wl, ll, "wo")
        h = rmsnorm(x, wl["ln2"], cfg.rms_eps)
        if ll is None:
            x = x + _mlp(h, wl, cfg)
        else:
            x = x + proj(
                jax.nn.silu(proj(h, wl, ll, "wg")) * proj(h, wl, ll, "wu"),
                wl, ll, "wd",
            )
        return x, (k, v)

    # jax.checkpoint trades FLOPs for HBM: only layer-boundary residuals are
    # kept live for the backward pass (the long-sequence training recipe;
    # reference trains seq 8192 under flash-attn, pretrain/train.py:142,170)
    layer_fn = jax.checkpoint(layer) if remat else layer
    if accum_stack_grads:
        # carry-accumulated custom-vjp stack: training only (no cache, no
        # LoRA); implies per-layer recompute in the backward (remat)
        assert lora is None, "accum_stack_grads does not carry LoRA"
        assert cache is None, "accum_stack_grads is a training-only path"
        assert not isinstance(lp, (list, tuple)), (
            "accum_stack_grads expects the canonical stacked layer layout"
        )
        x = stack_apply_accum(
            cfg, attn_impl, lp, x, positions, inv_freqs, attn_mask, mask
        )
        kv = (None, None)
    elif isinstance(lp, (list, tuple)):
        # GROUPED layer layout (training.pretrain.group_layer_params): the
        # stack is split into separate per-group leaves and scanned group
        # by group.  XLA double-buffers a scan's per-iteration outputs —
        # for the backward scan those outputs ARE the stacked weight
        # gradients, so one 28-layer scan keeps 2x the full layer grads
        # live (+3.9 GB at 3B bf16).  With G groups only the ACTIVE
        # group's gradient output is double-buffered (~1/G of that), which
        # is what fits the single-chip seq-8192 recipe.  Separate leaves
        # (not slices of one array) keep the grad of each group free of
        # the pad-to-full-and-add transpose that static slicing creates.
        assert lora is None, "grouped layer layout does not carry LoRA"
        assert cache is None, "grouped layer layout is a training-only path"
        for lp_g in lp:
            x, _ = lax.scan(layer_fn, x, lp_g)
        kv = (None, None)
    else:
        scan_in = (lp, lora["layers"]) if lora is not None else lp
        if scan_layers:
            x, kv = lax.scan(layer_fn, x, scan_in)
        else:
            ks_list, vs_list = [], []
            for i in range(cfg.num_layers):
                sc_i = jax.tree.map(lambda a: a[i], scan_in)
                x, (k_i, v_i) = layer_fn(x, sc_i)
                if cache is not None:
                    ks_list.append(k_i)
                    vs_list.append(v_i)
            kv = (
                (jnp.stack(ks_list), jnp.stack(vs_list))
                if cache is not None
                else (None, None)
            )

    x = rmsnorm(x, params["ln_f"], cfg.rms_eps)
    if return_hidden:
        logits = x  # final normed hidden states (B, S, D); callers apply
        # lm_head_logits per sequence chunk (chunked-vocab loss: a full
        # (S, padded_vocab) fp32 logits + grad pair is ~10 GB at seq 8192)
    else:
        logits = lm_head_logits(params, x)

    new_cache = None
    if cache is not None:
        ks, vs = kv  # (L, B, S, KV, HD)
        lanes = cache_slots if cache_slots is not None else jnp.arange(B)
        quant = kv_cache_is_quantized(cache)
        if B == 1:
            # prefill fast path: one whole-stack dynamic_update_slice into
            # the (donated) cache — in place, no gather/scatter machinery
            if quant:
                # quantized layout keeps positions-major; values flatten
                # their (KV, HD) minor dims to match the flat cache
                kq, ksc = quantize_kv(ks)  # (L,1,S,KV,HD) int8, (L,1,S,KV)
                vq, vsc = quantize_kv(vs)
                Lr, _, Sr = kq.shape[:3]
                qstart = (0, lanes[0], write_off[0], 0)
                new_cache = {
                    "k": lax.dynamic_update_slice(
                        cache["k"], kq.reshape(Lr, 1, Sr, -1), qstart
                    ),
                    "v": lax.dynamic_update_slice(
                        cache["v"], vq.reshape(Lr, 1, Sr, -1), qstart
                    ),
                    "scale": lax.dynamic_update_slice(
                        cache["scale"],
                        jnp.concatenate([ksc, vsc], axis=-1),
                        qstart,
                    ),
                }
            else:
                kw = jnp.swapaxes(ks, 2, 3)  # (L, 1, KV, S, HD)
                vw = jnp.swapaxes(vs, 2, 3)
                start = (0, lanes[0], 0, write_off[0], 0)
                new_cache = {
                    "k": lax.dynamic_update_slice(
                        cache["k"], kw.astype(cache["k"].dtype), start
                    ),
                    "v": lax.dynamic_update_slice(
                        cache["v"], vw.astype(cache["v"].dtype), start
                    ),
                }
        else:
            # scatter each slot's sequence into its cache lane at its offset
            pos_idx = write_off[:, None] + jnp.arange(S)[None, :]  # (B, S)
            batch_idx = jnp.broadcast_to(lanes[:, None], (B, S))
            if quant:
                kq, ksc = quantize_kv(ks)  # (L,B,S,KV,HD) int8, (L,B,S,KV)
                vq, vsc = quantize_kv(vs)
                kq = kq.reshape(*kq.shape[:3], -1)  # flat (L,B,S,KV*HD)
                vq = vq.reshape(*vq.shape[:3], -1)
                new_cache = {
                    "k": _scatter_seq_q(cache["k"], kq, batch_idx, pos_idx),
                    "v": _scatter_seq_q(cache["v"], vq, batch_idx, pos_idx),
                    "scale": _scatter_seq_q(
                        cache["scale"],
                        jnp.concatenate([ksc, vsc], axis=-1),
                        batch_idx, pos_idx,
                    ),
                }
            else:
                new_cache = {
                    "k": _scatter_seq(cache["k"], ks, batch_idx, pos_idx),
                    "v": _scatter_seq(cache["v"], vs, batch_idx, pos_idx),
                }
    return logits, new_cache


def _scatter_seq(cache, kv, batch_idx, pos_idx):
    """Write kv (L,B,S,KV,HD) into cache (L,B,KV,Smax,HD) at pos_idx (B,S)."""
    KV = cache.shape[2]
    kv_idx = jnp.arange(KV)[None, :, None]  # (1, KV, 1)

    def one_layer(c_l, kv_l):
        vals = jnp.swapaxes(kv_l, 1, 2)  # (B, KV, S, HD)
        return c_l.at[
            batch_idx[:, None, :], kv_idx, pos_idx[:, None, :]
        ].set(vals.astype(c_l.dtype))

    return jax.vmap(one_layer)(cache, kv)


def _scatter_seq_q(cache, vals, batch_idx, pos_idx):
    """Write (L,B,S,...) values into a position-major quantized cache
    array (L,B,Smax,...) at pos_idx (B,S) — payloads and scales alike."""

    def one_layer(c_l, v_l):
        return c_l.at[batch_idx, pos_idx].set(v_l.astype(c_l.dtype))

    return jax.vmap(one_layer)(cache, vals)


def _project_qkv(h, wl, cfg: LlamaConfig, mm=matmul_maybe_quant):
    """Q/K/V projections, from a fused ``wqkv`` leaf when present.

    Serving fuses wq|wk|wv into one matmul (``fuse_layer_weights``): one MXU
    dispatch instead of three and fewer fusion boundaries — measured ~1.8 ms
    off the 3B decode step on v5e.  Numerics are identical (per-output-column
    int8 scales concatenate losslessly).  ``mm`` selects the matmul flavour
    (weight-only dequant, or w8a8 on the chunk-prefill hot path).
    """
    HD, KV, H = cfg.head_dim, cfg.num_kv_heads, cfg.num_heads
    if "wqkv" in wl:
        qkv = mm(h, wl["wqkv"])
        nq = H * HD
        q = _split_heads(qkv[..., :nq], H, HD)
        k = _split_heads(qkv[..., nq : nq + KV * HD], KV, HD)
        v = _split_heads(qkv[..., nq + KV * HD :], KV, HD)
    else:
        q = _split_heads(mm(h, wl["wq"]), H, HD)
        k = _split_heads(mm(h, wl["wk"]), KV, HD)
        v = _split_heads(mm(h, wl["wv"]), KV, HD)
    return q, k, v


def _mlp(h, wl, cfg: LlamaConfig, mm=matmul_maybe_quant):
    """SwiGLU MLP, from a fused ``wgu`` leaf when present."""
    if "wgu" in wl:
        gu = mm(h, wl["wgu"])
        F = cfg.intermediate_size
        act = jax.nn.silu(gu[..., :F]) * gu[..., F:]
    else:
        act = jax.nn.silu(mm(h, wl["wg"])) * mm(h, wl["wu"])
    return mm(act, wl["wd"])


def _chunk_streaming_attn(
    qg: jnp.ndarray,       # (S, KV, G, HD) chunk queries
    k_s: jnp.ndarray,      # (KV, hist, HD) history keys (bf16 or int8)
    v_s: jnp.ndarray,      # (KV, hist, HD)
    ks_s,                  # (KV, hist) fp32 scales or None
    vs_s,                  # (KV, hist) fp32 scales or None
    positions: jnp.ndarray,  # (S,) absolute positions of the chunk queries
    hist_bucket: int,
    block_k: int = 256,
    n_live: Optional[jnp.ndarray] = None,  # () live-history frontier —
    # blocks past it are skipped entirely (their keys are causally
    # masked anyway, so skipping is exact)
) -> jnp.ndarray:
    """Online-softmax cross-attention of a prompt chunk over its history.

    A dense chunk attention materialises ``(KV, G, S, hist)`` fp32 scores
    — 805 MB per layer at S=1024 / hist=8192 — and the masked-softmax
    chain re-reads them several times: measured 2.3 s per int8 chunk at
    hist 8192 on v5e (94 ms bf16 at 2048).  Streaming key blocks through
    a flash accumulator keeps temporaries at block size, and an int8
    history dequantises per block in registers instead of materialising a
    bf16 copy of the cache.

    The QK^T and PV dots run on MODEL-dtype operands with fp32
    accumulation — bf16 in production, full MXU rate (fp32 operands
    halve it; chunk rounds are the 8k admission wall, DECISIONS r5);
    f32 test models keep f32 dots so chunk-vs-full equality tests stay
    exact.  Int8 history scales apply to SCORES and PROBS per position,
    flash-attention style.  ``n_live`` bounds the block loop
    dynamically: a chunk at offset 4608 of an 8192-bucket history reads
    4608+S positions, not 8192.
    """
    S, KV, G, HD = qg.shape
    block_k = min(block_k, hist_bucket)
    nk = hist_bucket // block_k
    assert nk * block_k == hist_bucket, "context buckets are 256-multiples"
    quant = ks_s is not None
    dot_dt = qg.dtype if qg.dtype != jnp.float16 else jnp.float32
    qb = (qg.astype(jnp.float32) * (HD**-0.5)).astype(dot_dt)

    k_blocks = jnp.moveaxis(k_s.reshape(KV, nk, block_k, HD), 1, 0)
    v_blocks = jnp.moveaxis(v_s.reshape(KV, nk, block_k, HD), 1, 0)
    if quant:
        ks_blocks = jnp.moveaxis(ks_s.reshape(KV, nk, block_k), 1, 0)
        vs_blocks = jnp.moveaxis(vs_s.reshape(KV, nk, block_k), 1, 0)

    if n_live is None:
        n_blocks = nk
    else:
        n_blocks = jnp.minimum(
            (n_live + block_k - 1) // block_k, nk
        ).astype(jnp.int32)

    def body(blk, carry):
        m, l, acc = carry
        kb = lax.dynamic_index_in_dim(k_blocks, blk, 0, keepdims=False)
        vb = lax.dynamic_index_in_dim(v_blocks, blk, 0, keepdims=False)
        s = jnp.einsum(
            "skgd,kbd->kgsb", qb, kb.astype(dot_dt),
            preferred_element_type=jnp.float32,
        )  # (KV, G, S, block_k)
        if quant:
            ksb = lax.dynamic_index_in_dim(ks_blocks, blk, 0,
                                           keepdims=False)  # (KV, block_k)
            s = s * ksb[:, None, None, :]
        kp = blk * block_k + jnp.arange(block_k)
        valid = kp[None, None, None, :] <= positions[None, None, :, None]
        s = jnp.where(valid, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        if quant:
            vsb = lax.dynamic_index_in_dim(vs_blocks, blk, 0,
                                           keepdims=False)
            p = p * vsb[:, None, None, :]
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "kgsb,kbd->kgsd", p.astype(dot_dt), vb.astype(dot_dt),
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new)

    m0 = jnp.full((KV, G, S), -1e30, jnp.float32)
    l0 = jnp.zeros((KV, G, S), jnp.float32)
    acc0 = jnp.zeros((KV, G, S, HD), jnp.float32)
    m, l, acc = lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # (KV, G, S, HD)
    return jnp.moveaxis(out, 2, 0).reshape(S, KV * G * HD)


def llama_prefill_chunk(
    params: Params,
    tokens: jnp.ndarray,   # (S,) int32 — one chunk of one slot's prompt
    cfg: LlamaConfig,
    cache: KVCache,
    offset: jnp.ndarray,   # () int32 — chunk start position in the context
    slot: jnp.ndarray,     # () int32 — target cache lane
    length: jnp.ndarray,   # () int32 — real tokens in this (padded) chunk
    *,
    hist_bucket: int,      # static: attention reads cache[:hist_bucket]
    w8a8: bool = False,    # static: int8-activation projections/MLP (the
    # chunk matmuls are the 8k admission wall: 120 TFLOP/s weight-only
    # dequant vs 169 w8a8 measured, DECISIONS r4-006/r5)
) -> Tuple[jnp.ndarray, KVCache]:
    """One prompt chunk against the KV history already in the cache.

    The building block of chunked prefill: long prompts (up to the
    reference's n_ctx 8192, llama_local.py:45-46) are written chunk by
    chunk, each chunk attending to every previously-written position plus
    causally to itself — so no prompt truncation and no O(S²) single-shot
    program at 8k.  Only full chunks may precede the final one; the final
    chunk may be padded, with ``length`` marking its real extent (garbage
    K/V beyond ``offset+length`` lands at positions >= the total prompt
    length, which decode masks via ``lengths``).

    Returns fp32 logits of the LAST real position ``(padded_vocab,)`` —
    callers sample the first generated token from the final chunk — and
    the updated cache.  Same carry-based layer loop as the decode step so
    the donated cache stays in place.
    """
    S = tokens.shape[0]
    KV, HD = cfg.num_kv_heads, cfg.head_dim
    G = cfg.num_heads // KV
    quant = kv_cache_is_quantized(cache)
    inv_freqs = rope_inv_freqs(cfg)
    positions = (offset + jnp.arange(S, dtype=jnp.int32))[None, :]  # (1, S)
    x = embed_lookup(params["embed"], tokens[None, :], dtype=params["ln_f"].dtype)

    lp = params["layers"]
    mm = matmul_w8a8 if w8a8 else matmul_maybe_quant

    def layer_body(i, carry):
        x, c = carry
        wl = jax.tree.map(lambda a: a[i], lp)
        h = rmsnorm(x, wl["ln1"], cfg.rms_eps)
        q, k, v = _project_qkv(h, wl, cfg, mm)  # (1, S, H/KV, HD)
        q = apply_rope(q, positions, inv_freqs)
        k = apply_rope(k, positions, inv_freqs)
        if quant:
            # position-major quantized layout: values flatten (KV, HD)
            kq, ksc = quantize_kv(k[0])  # (S,KV,HD) int8, (S,KV) f32
            vq, vsc = quantize_kv(v[0])
            c["k"] = lax.dynamic_update_slice(
                c["k"], kq.reshape(S, KV * HD)[None, None],
                (i, slot, offset, 0),
            )
            c["v"] = lax.dynamic_update_slice(
                c["v"], vq.reshape(S, KV * HD)[None, None],
                (i, slot, offset, 0),
            )
            c["scale"] = lax.dynamic_update_slice(
                c["scale"],
                jnp.concatenate([ksc, vsc], axis=-1)[None, None],
                (i, slot, offset, 0),
            )
            # history reads reshape only the hist-bucket slice (cheap),
            # never the cache
            k_s = jnp.swapaxes(lax.dynamic_slice(
                c["k"], (i, slot, 0, 0), (1, 1, hist_bucket, KV * HD)
            )[0, 0].reshape(hist_bucket, KV, HD), 0, 1)  # (KV, hist, HD)
            v_s = jnp.swapaxes(lax.dynamic_slice(
                c["v"], (i, slot, 0, 0), (1, 1, hist_bucket, KV * HD)
            )[0, 0].reshape(hist_bucket, KV, HD), 0, 1)
            sc_s = lax.dynamic_slice(
                c["scale"], (i, slot, 0, 0), (1, 1, hist_bucket, 2 * KV)
            )[0, 0]  # (hist, 2*KV)
            ks_s = sc_s[:, :KV].T  # (KV, hist)
            vs_s = sc_s[:, KV:].T
        else:
            kh = jnp.swapaxes(k, 1, 2)  # (1, KV, S, HD)
            vh = jnp.swapaxes(v, 1, 2)
            c["k"] = lax.dynamic_update_slice(
                c["k"], kh.astype(c["k"].dtype)[None], (i, slot, 0, offset, 0)
            )
            c["v"] = lax.dynamic_update_slice(
                c["v"], vh.astype(c["v"].dtype)[None], (i, slot, 0, offset, 0)
            )
            k_s = lax.dynamic_slice(
                c["k"], (i, slot, 0, 0, 0), (1, 1, KV, hist_bucket, HD)
            )[0, 0]
            v_s = lax.dynamic_slice(
                c["v"], (i, slot, 0, 0, 0), (1, 1, KV, hist_bucket, HD)
            )[0, 0]
            ks_s = vs_s = None
        qg = q[0].reshape(S, KV, G, HD)
        attn = _chunk_streaming_attn(
            qg, k_s, v_s, ks_s, vs_s, positions[0], hist_bucket,
            n_live=offset + S,
        ).reshape(1, S, cfg.num_heads * HD).astype(x.dtype)
        x = x + mm(attn, wl["wo"])
        h = rmsnorm(x, wl["ln2"], cfg.rms_eps)
        x = x + _mlp(h, wl, cfg, mm)
        return x, c

    x, new_cache = lax.fori_loop(
        0, cfg.num_layers, layer_body, (x, dict(cache))
    )
    x_last = lax.dynamic_slice(x, (0, length - 1, 0), (1, 1, x.shape[-1]))[0, 0]
    x_last = rmsnorm(x_last, params["ln_f"], cfg.rms_eps)
    head = params.get("lm_head")
    if head is None:
        logits = tied_lm_head_logits(x_last[None], params["embed"])[0]
    else:
        logits = matmul_maybe_quant(x_last[None], head).astype(jnp.float32)[0]
    return logits, new_cache


def llama_prefill_chunk_batch(
    params: Params,
    tokens: jnp.ndarray,   # (J, C) int32 — one chunk from each of J slots
    cfg: LlamaConfig,
    cache: KVCache,
    offsets: jnp.ndarray,  # (J,) chunk start positions
    slots: jnp.ndarray,    # (J,) target cache lanes
    lengths: jnp.ndarray,  # (J,) real tokens in each (padded) chunk
    *,
    hist_bucket: int,      # static: attention reads cache[:hist_bucket]
    w8a8: bool = False,    # static: int8-activation projections/MLP
) -> Tuple[jnp.ndarray, KVCache]:
    """One prompt chunk from EACH of J streams in a single program.

    A simultaneous burst of long prompts (the reference's 8k n_ctx,
    llama_local.py:45-46) used to admit as J x n_chunks sequential chunk
    programs — each ~50% MXU at S=1024 and one dispatch apiece, so an
    8 x 8k burst serialised ~6-10 s of admission before the median stream
    heard audio.  Folding the J chunks into one batched program turns the
    projections/MLP into (J*C, D) matmuls (deeper MXU pipelines) and pays
    ONE dispatch per round; each stream's chunk still attends only to its
    own slot's history via the same streaming-block attention, so the
    result is bit-comparable to J sequential ``llama_prefill_chunk`` calls
    (equivalence-tested).  Jobs must share the chunk width and history
    bucket — the engine batches exactly the lockstep groups a cold burst
    produces and falls back to the single-chunk program otherwise.

    Returns the last REAL position's fp32 logits for every job
    ``(J, padded_vocab)`` (callers use them only on final chunks) and the
    updated cache.
    """
    J, C = tokens.shape
    KV, HD = cfg.num_kv_heads, cfg.head_dim
    G = cfg.num_heads // KV
    quant = kv_cache_is_quantized(cache)
    inv_freqs = rope_inv_freqs(cfg)
    positions = offsets[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
    x = embed_lookup(params["embed"], tokens, dtype=params["ln_f"].dtype)

    lp = params["layers"]
    mm = matmul_w8a8 if w8a8 else matmul_maybe_quant

    def layer_body(i, carry):
        x, c = carry
        wl = jax.tree.map(lambda a: a[i], lp)
        h = rmsnorm(x, wl["ln1"], cfg.rms_eps)
        q, k, v = _project_qkv(h, wl, cfg, mm)  # (J, C, H/KV, HD)
        q = apply_rope(q, positions, inv_freqs)
        k = apply_rope(k, positions, inv_freqs)
        if quant:
            kq, ksc = quantize_kv(k)  # (J,C,KV,HD) int8, (J,C,KV) f32
            vq, vsc = quantize_kv(v)
            kq = kq.reshape(J, C, KV * HD)  # flat cache minor axis
            vq = vq.reshape(J, C, KV * HD)
            sc = jnp.concatenate([ksc, vsc], axis=-1)  # (J, C, 2*KV)
            for j in range(J):
                c["k"] = lax.dynamic_update_slice(
                    c["k"], kq[j][None, None], (i, slots[j], offsets[j], 0)
                )
                c["v"] = lax.dynamic_update_slice(
                    c["v"], vq[j][None, None], (i, slots[j], offsets[j], 0)
                )
                c["scale"] = lax.dynamic_update_slice(
                    c["scale"], sc[j][None, None], (i, slots[j], offsets[j], 0)
                )
            k_hist, v_hist, ks_hist, vs_hist = [], [], [], []
            for j in range(J):
                k_hist.append(jnp.swapaxes(lax.dynamic_slice(
                    c["k"], (i, slots[j], 0, 0), (1, 1, hist_bucket, KV * HD)
                )[0, 0].reshape(hist_bucket, KV, HD), 0, 1))
                v_hist.append(jnp.swapaxes(lax.dynamic_slice(
                    c["v"], (i, slots[j], 0, 0), (1, 1, hist_bucket, KV * HD)
                )[0, 0].reshape(hist_bucket, KV, HD), 0, 1))
                sc_j = lax.dynamic_slice(
                    c["scale"], (i, slots[j], 0, 0), (1, 1, hist_bucket, 2 * KV)
                )[0, 0]
                ks_hist.append(sc_j[:, :KV].T)
                vs_hist.append(sc_j[:, KV:].T)
            qg = q.reshape(J, C, KV, G, HD)
            n_live = jnp.max(offsets) + C  # lockstep: offsets are equal
            attn = jax.vmap(
                lambda qg_, k_, v_, ks_, vs_, pos_: _chunk_streaming_attn(
                    qg_, k_, v_, ks_, vs_, pos_, hist_bucket,
                    n_live=n_live,
                )
            )(qg, jnp.stack(k_hist), jnp.stack(v_hist),
              jnp.stack(ks_hist), jnp.stack(vs_hist), positions)
        else:
            kh = jnp.swapaxes(k, 1, 2)  # (J, KV, C, HD)
            vh = jnp.swapaxes(v, 1, 2)
            for j in range(J):
                c["k"] = lax.dynamic_update_slice(
                    c["k"], kh[j].astype(c["k"].dtype)[None, None],
                    (i, slots[j], 0, offsets[j], 0),
                )
                c["v"] = lax.dynamic_update_slice(
                    c["v"], vh[j].astype(c["v"].dtype)[None, None],
                    (i, slots[j], 0, offsets[j], 0),
                )
            k_hist = [lax.dynamic_slice(
                c["k"], (i, slots[j], 0, 0, 0), (1, 1, KV, hist_bucket, HD)
            )[0, 0] for j in range(J)]
            v_hist = [lax.dynamic_slice(
                c["v"], (i, slots[j], 0, 0, 0), (1, 1, KV, hist_bucket, HD)
            )[0, 0] for j in range(J)]
            qg = q.reshape(J, C, KV, G, HD)
            n_live = jnp.max(offsets) + C
            attn = jax.vmap(
                lambda qg_, k_, v_, pos_: _chunk_streaming_attn(
                    qg_, k_, v_, None, None, pos_, hist_bucket,
                    n_live=n_live,
                )
            )(qg, jnp.stack(k_hist), jnp.stack(v_hist), positions)
        attn = attn.reshape(J, C, cfg.num_heads * HD).astype(x.dtype)
        x = x + mm(attn, wl["wo"])
        h = rmsnorm(x, wl["ln2"], cfg.rms_eps)
        x = x + _mlp(h, wl, cfg, mm)
        return x, c

    x, new_cache = lax.fori_loop(
        0, cfg.num_layers, layer_body, (x, dict(cache))
    )
    x_last = jnp.take_along_axis(
        x, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]  # (J, D)
    x_last = rmsnorm(x_last, params["ln_f"], cfg.rms_eps)
    head = params.get("lm_head")
    if head is None:
        logits = tied_lm_head_logits(x_last, params["embed"])
    else:
        logits = matmul_maybe_quant(x_last, head).astype(jnp.float32)
    return logits, new_cache


def llama_decode_step(
    params: Params,
    tokens: jnp.ndarray,  # (B,) int32 — one new token per slot
    cfg: LlamaConfig,
    cache: KVCache,
    lengths: jnp.ndarray,  # (B,) current context length per slot
    *,
    active: Optional[jnp.ndarray] = None,  # (B,) bool; inactive slots skipped
    attn_impl: str = "dense",  # "dense" | "pallas" (kept for A/B benchmarks)
    bucket: Optional[int] = None,  # static context bucket (<= max_seq); the
    # attention only reads cache[:bucket] — callers guarantee all live
    # lengths stay < bucket for the duration of the compiled program
) -> Tuple[jnp.ndarray, KVCache]:
    """One autoregressive decode step for a batch of slots.

    The new token is written at position ``lengths[b]``; attention sees
    positions ``<= lengths[b]``.  Returns fp32 logits ``(B, padded_vocab)``
    and the updated cache.  This is the per-token hot loop the reference
    delegates to llama.cpp (llama_local.py:79) — here one jitted XLA program.

    TPU shape (DECISIONS r1-011): the full stacked KV cache rides the layer
    loop as a **carry** so XLA keeps it in place (donated buffer, zero
    copies); writes are per-slot ``dynamic_update_slice``; attention is a
    dense einsum over a static ``bucket`` prefix of the cache so HBM traffic
    scales with the live context, not allocated capacity.  The previous
    scan-xs/ys structure round-tripped the full cache through HBM every
    step (~3.8 GB at 8x2048) and measured 20.7 ms vs 6.9 ms for this one.
    """
    B = tokens.shape[0]
    quant = kv_cache_is_quantized(cache)
    # position axis: dim 2 in the quantized position-major layout, dim 3
    # in the bf16 head-major layout (init_kv_cache)
    S = cache["k"].shape[2 if quant else 3]
    DKV = cfg.num_kv_heads * cfg.head_dim
    KV, HD = cfg.num_kv_heads, cfg.head_dim
    G = cfg.num_heads // KV
    bkt = min(bucket or S, S)
    inv_freqs = rope_inv_freqs(cfg)
    x = embed_lookup(
        params["embed"], tokens[:, None], dtype=params["ln_f"].dtype
    )  # (B, 1, D)
    positions = lengths[:, None]

    key_pos = jnp.arange(bkt)[None, :]  # (1, bkt)
    key_mask = key_pos <= lengths[:, None]  # (B, bkt) inclusive of new token

    lp = params["layers"]
    # slot-kernel path: Mosaic DMA cannot slice the 16-lane minor dim of
    # the (L,B,S,2KV) scale storage, so the kernel reads a SCALE-MAJOR
    # (L,B,2KV,S) view.  Transposed once per step and carried through the
    # layer loop (each layer's new-position scales are written into both),
    # not per layer — 28 transposes of the full array would swamp the step.
    slot_kernel = attn_impl == "pallas" and quant
    sc_t0 = jnp.swapaxes(cache["scale"], 2, 3) if slot_kernel else None

    def layer_body(i, carry):
        x, c, sc_t = carry
        wl = jax.tree.map(lambda a: a[i], lp)
        h = rmsnorm(x, wl["ln1"], cfg.rms_eps)
        q, k, v = _project_qkv(h, wl, cfg)
        q = apply_rope(q, positions, inv_freqs)
        k = apply_rope(k, positions, inv_freqs)

        # per-slot in-place writes at position lengths[b] (scalar-start DUS
        # keeps the carried cache buffer in place; a gather-scatter costs
        # ~25 us/layer extra on v5e)
        for b in range(B):
            if quant:
                # position-major layout: one contiguous (KV, HD) lane-row
                # write per slot (in place; see init_kv_cache layout note)
                kq, ksc = quantize_kv(k[b, 0])  # (KV, HD), (KV,)
                vq, vsc = quantize_kv(v[b, 0])
                c["k"] = lax.dynamic_update_slice(
                    c["k"], kq.reshape(1, 1, 1, DKV), (i, b, lengths[b], 0)
                )
                c["v"] = lax.dynamic_update_slice(
                    c["v"], vq.reshape(1, 1, 1, DKV), (i, b, lengths[b], 0)
                )
                sc_new = jnp.concatenate([ksc, vsc])
                c["scale"] = lax.dynamic_update_slice(
                    c["scale"],
                    sc_new.reshape(1, 1, 1, 2 * KV),
                    (i, b, lengths[b], 0),
                )
                if sc_t is not None:  # keep the scale-major view current
                    sc_t = lax.dynamic_update_slice(
                        sc_t,
                        sc_new.reshape(1, 1, 2 * KV, 1),
                        (i, b, 0, lengths[b]),
                    )
            else:
                c["k"] = lax.dynamic_update_slice(
                    c["k"],
                    k[b, 0].astype(c["k"].dtype).reshape(1, 1, KV, 1, HD),
                    (i, b, 0, lengths[b], 0),
                )
                c["v"] = lax.dynamic_update_slice(
                    c["v"],
                    v[b, 0].astype(c["v"].dtype).reshape(1, 1, KV, 1, HD),
                    (i, b, 0, lengths[b], 0),
                )

        if attn_impl == "pallas":
            if quant:
                # slot-wise flash kernel over the position-major int8
                # cache: per-step HBM traffic follows each slot's LIVE
                # length (the dense path reads the full bucket per slot)
                # and payloads stream as int8 with in-register dequant —
                # the production long-context path (DECISIONS r5)
                from ..ops.decode_attention import decode_attention_int8_slots

                # thread_cache: k/v/scale_t flow THROUGH the kernel
                # (aliased) so XLA keeps this loop's interleaved cache
                # writes in place — without it every layer copies the
                # multi-GB cache around the opaque custom call (16.6
                # ms/layer measured at 8x8192; DECISIONS r5)
                attn, c["k"], c["v"], sc_t = decode_attention_int8_slots(
                    q[:, 0],
                    c["k"],
                    c["v"],
                    c["scale"],
                    lengths + 1,
                    i,
                    interpret=jax.default_backend() != "tpu",
                    kv_scale_t=sc_t,
                    thread_cache=True,
                )
                attn = attn.reshape(
                    B, 1, cfg.num_heads * HD
                ).astype(x.dtype)
            else:
                from ..ops.decode_attention import decode_attention_layered

                attn = decode_attention_layered(
                    q[:, 0],
                    c["k"],
                    c["v"],
                    lengths + 1,
                    i,
                    interpret=jax.default_backend() != "tpu",
                ).reshape(B, 1, cfg.num_heads * HD).astype(x.dtype)
        else:
            qg = q.reshape(B, KV, G, HD)
            if quant:
                # int8 MXU path: the cache streams from HBM AS int8 (an
                # `astype` before the dot materialises a bf16 copy — 2.5x
                # the traffic, measured 32 ms vs 9.4 ms bf16 at bucket
                # 2048).  Queries quantize per row (B,KV,G); scores come
                # out int32 and rescale by q-scale x per-position k-scale.
                # Slices are position-major (B, bkt, KV, HD); the dots
                # contract over HD / bkt with KV as a strided batch dim —
                # XLA handles the bucket-sized operands without touching
                # the cache layout (the whole point; see init_kv_cache).
                k_s = lax.dynamic_slice(
                    c["k"], (i, 0, 0, 0), (1, B, bkt, DKV)
                )[0].reshape(B, bkt, KV, HD)
                v_s = lax.dynamic_slice(
                    c["v"], (i, 0, 0, 0), (1, B, bkt, DKV)
                )[0].reshape(B, bkt, KV, HD)
                sc_s = lax.dynamic_slice(
                    c["scale"], (i, 0, 0, 0), (1, B, bkt, 2 * KV)
                )[0]  # (B, bkt, 2*KV)
                ks_s = jnp.swapaxes(sc_s[..., :KV], 1, 2)  # (B, KV, bkt)
                vs_s = jnp.swapaxes(sc_s[..., KV:], 1, 2)
                qsc = jnp.maximum(
                    jnp.max(jnp.abs(qg.astype(jnp.float32)), axis=-1), 1e-8
                ) / 127.0  # (B, KV, G)
                q8 = jnp.clip(
                    jnp.round(qg.astype(jnp.float32) / qsc[..., None]),
                    -127, 127,
                ).astype(jnp.int8)
                s32 = jnp.einsum(
                    "bkgd,bskd->bkgs", q8, k_s,
                    preferred_element_type=jnp.int32,
                )
                scores = (
                    s32.astype(jnp.float32)
                    * qsc[..., None]
                    * ks_s[:, :, None, :]
                    * (HD**-0.5)
                )
                scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
                probs = jax.nn.softmax(scores, axis=-1)
                # fold the per-position v-scale into the probs (tiny
                # (B,KV,G,bkt) tensor), re-quantize per row, and keep the
                # PV dot in int8 as well
                pv = probs * vs_s[:, :, None, :]
                psc = jnp.maximum(jnp.max(pv, axis=-1), 1e-30) / 127.0
                p8 = jnp.clip(
                    jnp.round(pv / psc[..., None]), -127, 127
                ).astype(jnp.int8)
                o32 = jnp.einsum(
                    "bkgs,bskd->bkgd", p8, v_s,
                    preferred_element_type=jnp.int32,
                )
                attn = (
                    (o32.astype(jnp.float32) * psc[..., None])
                    .reshape(B, 1, cfg.num_heads * HD)
                    .astype(x.dtype)
                )
            else:
                k_s = lax.dynamic_slice(
                    c["k"], (i, 0, 0, 0, 0), (1, B, KV, bkt, HD)
                )[0]
                v_s = lax.dynamic_slice(
                    c["v"], (i, 0, 0, 0, 0), (1, B, KV, bkt, HD)
                )[0]
                scores = jnp.einsum(
                    "bkgd,bksd->bkgs", qg, k_s.astype(qg.dtype),
                    preferred_element_type=jnp.float32,
                ) * (HD**-0.5)
                scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
                probs = jax.nn.softmax(scores, axis=-1)
                attn = jnp.einsum(
                    "bkgs,bksd->bkgd", probs.astype(x.dtype), v_s.astype(x.dtype),
                    preferred_element_type=jnp.float32,
                ).reshape(B, 1, cfg.num_heads * HD).astype(x.dtype)
        x = x + matmul_maybe_quant(attn, wl["wo"])
        h = rmsnorm(x, wl["ln2"], cfg.rms_eps)
        x = x + _mlp(h, wl, cfg)
        return x, c, sc_t

    x, new_cache, _ = lax.fori_loop(
        0, cfg.num_layers, layer_body, (x, dict(cache), sc_t0)
    )
    x = rmsnorm(x[:, 0], params["ln_f"], cfg.rms_eps)
    head = params.get("lm_head")
    if head is None:
        logits = tied_lm_head_logits(x, params["embed"])
    else:
        logits = matmul_maybe_quant(x, head).astype(jnp.float32)
    if active is not None:
        logits = jnp.where(active[:, None], logits, 0.0)
    return logits, new_cache
