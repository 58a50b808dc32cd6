"""Length-aware flash decode attention over the slot KV cache (Pallas).

The serving hot loop reads the KV cache every step; a dense XLA attention
reads the FULL bucketed cache (slots x bucket) regardless of how much of
it is live.  These kernels are the TPU-native answer to vLLM's
PagedAttention (reference engine_class.py, SURVEY.md §2.3): HBM traffic
scales with each slot's LIVE length, not allocated capacity.

Two generations coexist:

- ``decode_attention_int8_slots`` (r5, THE production long-context path,
  auto-selected by the engine for int8 caches): one grid program per
  SLOT covering all kv heads, whole-slot ``(block_s, KV*HD)`` int8 DMA
  double-buffered, in-register scale dequant, cache aliased through the
  call so the decode layer loop's writes stay in place.  Reads the flat
  position-major int8 cache ``(L, B, S, KV*HD)`` + scale-major
  ``(L, B, 2KV, S)`` view.
- ``decode_attention`` / ``decode_attention_layered`` (r1-r4): one
  program per (slot, kv-head) over the bf16 head-major cache
  ``(B, KV, S, HD)`` — DMA-latency-bound at batch 8 (64 KB blocks);
  kept for the bf16 cache A/B and tests.

Queries are grouped GQA ``(B, H, HD)`` with ``G = H // KV`` heads per
kv head in both.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def decode_attention_reference(
    q: jnp.ndarray,        # (B, H, HD)
    k_cache: jnp.ndarray,  # (B, KV, S, HD)
    v_cache: jnp.ndarray,  # (B, KV, S, HD)
    lengths: jnp.ndarray,  # (B,) number of live positions (inclusive count)
) -> jnp.ndarray:
    """Dense jnp oracle used for tests and as the CPU fallback."""
    B, H, HD = q.shape
    KV = k_cache.shape[1]
    G = H // KV
    S = k_cache.shape[2]
    qg = q.reshape(B, KV, G, HD)
    scores = jnp.einsum(
        "bkgd,bksd->bkgs", qg, k_cache, preferred_element_type=jnp.float32
    ) * (HD**-0.5)
    mask = jnp.arange(S)[None, :] < lengths[:, None]  # (B, S)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgs,bksd->bkgd", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, H, HD).astype(q.dtype)


def _decode_attn_kernel(
    lengths_ref,     # SMEM (B,)
    q_ref,           # VMEM (1, H, HD) — grouped head order
    k_hbm,           # ANY  (B, KV, S, HD)
    v_hbm,           # ANY  (B, KV, S, HD)
    o_ref,           # VMEM (1, H, HD)
    k_buf,           # VMEM scratch (2, block_s, HD)
    v_buf,           # VMEM scratch (2, block_s, HD)
    sem,             # DMA sems (2, 2)
    *,
    block_s: int,
    scale: float,
    num_kv: int,
):
    """One program per slot; static loop over kv heads inside (Mosaic
    requires >=8 sublanes per q block, so G-row blocks are not legal)."""
    b = pl.program_id(0)
    length = lengths_ref[b]
    n_blocks = pl.cdiv(length, block_s)
    H = q_ref.shape[1]
    G = H // num_kv

    def k_dma(slot, h, blk):
        return pltpu.make_async_copy(
            k_hbm.at[b, h, pl.ds(blk * block_s, block_s), :],
            k_buf.at[slot],
            sem.at[slot, 0],
        )

    def v_dma(slot, h, blk):
        return pltpu.make_async_copy(
            v_hbm.at[b, h, pl.ds(blk * block_s, block_s), :],
            v_buf.at[slot],
            sem.at[slot, 1],
        )

    for h in range(num_kv):
        @pl.when(n_blocks > 0)
        def _():
            k_dma(0, h, 0).start()
            v_dma(0, h, 0).start()

        q = q_ref[0, h * G : (h + 1) * G, :].astype(jnp.float32) * scale

        def body(blk, state, h=h):
            m, l, acc = state
            slot = blk % 2

            @pl.when(blk + 1 < n_blocks)
            def _():
                k_dma((blk + 1) % 2, h, blk + 1).start()
                v_dma((blk + 1) % 2, h, blk + 1).start()

            k_dma(slot, h, blk).wait()
            v_dma(slot, h, blk).wait()

            k = k_buf[slot].astype(jnp.float32)  # (block_s, HD)
            v = v_buf[slot].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G, block_s)
            pos = blk * block_s + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1
            )
            s = jnp.where(pos < length, s, -1e30)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((G, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((G, 1), jnp.float32)
        acc0 = jnp.zeros((G, q.shape[1]), jnp.float32)
        m, l, acc = lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        o_ref[0, h * G : (h + 1) * G, :] = (
            acc / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)


def _decode_attn_kernel_layered(
    layer_ref,       # SMEM (1,)
    lengths_ref,     # SMEM (B,)
    q_ref,           # VMEM (1, H, HD)
    k_hbm,           # ANY  (L, B, KV, S, HD)
    v_hbm,           # ANY  (L, B, KV, S, HD)
    *rest,           # [ksc_hbm, vsc_hbm (L, B, KV, 1, S)] + o_ref + scratch
    block_s: int,
    scale: float,
    num_kv: int,
    quant: bool,
):
    """Same flash-decode loop as ``_decode_attn_kernel`` but the cache keeps
    its stacked layer axis and the layer index arrives as a prefetch scalar —
    so a layer loop carrying the full cache never slices it in HBM.

    ``quant=True`` streams an int8 cache: payloads DMA as int8 (HALF the
    HBM traffic of bf16 — the entire point of the int8 KV cache, which a
    dense XLA path forfeits by materialising a bf16 dequant copy) and the
    per-position fp32 scales ride alongside; dequant happens in VMEM
    registers — scores scale by k_scale, probs by v_scale.
    """
    if quant:
        (ksc_hbm, vsc_hbm, o_ref, k_buf, v_buf,
         ksc_buf, vsc_buf, sem) = rest
    else:
        o_ref, k_buf, v_buf, sem = rest
    b = pl.program_id(0)
    li = layer_ref[0]
    length = lengths_ref[b]
    n_blocks = pl.cdiv(length, block_s)
    H = q_ref.shape[1]
    G = H // num_kv

    def k_dma(slot, h, blk):
        return pltpu.make_async_copy(
            k_hbm.at[li, b, h, pl.ds(blk * block_s, block_s), :],
            k_buf.at[slot],
            sem.at[slot, 0],
        )

    def v_dma(slot, h, blk):
        return pltpu.make_async_copy(
            v_hbm.at[li, b, h, pl.ds(blk * block_s, block_s), :],
            v_buf.at[slot],
            sem.at[slot, 1],
        )

    def ksc_dma(slot, h, blk):
        return pltpu.make_async_copy(
            ksc_hbm.at[li, b, h, :, pl.ds(blk * block_s, block_s)],
            ksc_buf.at[slot],
            sem.at[slot, 2],
        )

    def vsc_dma(slot, h, blk):
        return pltpu.make_async_copy(
            vsc_hbm.at[li, b, h, :, pl.ds(blk * block_s, block_s)],
            vsc_buf.at[slot],
            sem.at[slot, 3],
        )

    def start_all(slot, h, blk):
        k_dma(slot, h, blk).start()
        v_dma(slot, h, blk).start()
        if quant:
            ksc_dma(slot, h, blk).start()
            vsc_dma(slot, h, blk).start()

    def wait_all(slot, h, blk):
        k_dma(slot, h, blk).wait()
        v_dma(slot, h, blk).wait()
        if quant:
            ksc_dma(slot, h, blk).wait()
            vsc_dma(slot, h, blk).wait()

    for h in range(num_kv):
        @pl.when(n_blocks > 0)
        def _():
            start_all(0, h, 0)

        q = q_ref[0, h * G : (h + 1) * G, :].astype(jnp.float32) * scale

        def body(blk, state, h=h):
            m, l, acc = state
            slot = blk % 2

            @pl.when(blk + 1 < n_blocks)
            def _():
                start_all((blk + 1) % 2, h, blk + 1)

            wait_all(slot, h, blk)

            k = k_buf[slot].astype(jnp.float32)
            v = v_buf[slot].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quant:
                s = s * ksc_buf[slot]  # (G, block_s) * (1, block_s)
            pos = blk * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(pos < length, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if quant:
                p = p * vsc_buf[slot]
            acc_new = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((G, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((G, 1), jnp.float32)
        acc0 = jnp.zeros((G, q.shape[1]), jnp.float32)
        m, l, acc = lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        o_ref[0, h * G : (h + 1) * G, :] = (
            acc / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)


def decode_attention_layered(
    q: jnp.ndarray,        # (B, H, HD)
    k_cache: jnp.ndarray,  # (L, B, KV, S, HD) bf16 or int8
    v_cache: jnp.ndarray,  # (L, B, KV, S, HD)
    lengths: jnp.ndarray,  # (B,)
    layer: jnp.ndarray,    # () int32 — which layer slice to attend over
    *,
    k_scale: Optional[jnp.ndarray] = None,  # (L, B, KV, S) fp32 (int8 cache)
    v_scale: Optional[jnp.ndarray] = None,
    block_s: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash decode attention reading one layer of the stacked cache.

    HBM traffic scales with each slot's LIVE length (a 512-token stream
    co-batched with an 8k stream reads 512 positions, not the 8k bucket)
    and an int8 cache streams as int8 — per-position scales are applied
    in-kernel, never materialising a dequantised copy.
    """
    B, H, HD = q.shape
    KV, S = k_cache.shape[2], k_cache.shape[3]
    scale = HD**-0.5
    quant = k_scale is not None
    block_s = min(block_s, S)
    if S % block_s != 0 or interpret:
        kl = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
        if quant:
            ksl = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=False)
            vsl = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=False)
            kl = kl.astype(jnp.float32) * ksl[..., None]
            vl = vl.astype(jnp.float32) * vsl[..., None]
        return decode_attention_reference(q, kl, vl, lengths)

    operands = [jnp.asarray(layer, jnp.int32)[None], lengths, q, k_cache, v_cache]
    in_specs = [
        pl.BlockSpec(
            (1, H, HD), lambda b, li, lens: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    scratch = [
        pltpu.VMEM((2, block_s, HD), k_cache.dtype),
        pltpu.VMEM((2, block_s, HD), v_cache.dtype),
    ]
    if quant:
        # scales get a singleton sublane axis so DMA slices stay 2-D
        operands += [
            k_scale.reshape(*k_scale.shape[:3], 1, S),
            v_scale.reshape(*v_scale.shape[:3], 1, S),
        ]
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        scratch += [
            pltpu.VMEM((2, 1, block_s), jnp.float32),
            pltpu.VMEM((2, 1, block_s), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2, 4 if quant else 2)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, H, HD), lambda b, li, lens: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_attn_kernel_layered, block_s=block_s, scale=scale, num_kv=KV,
        quant=quant,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, HD), q.dtype),
    )(*operands)


def _slot_attn_kernel(
    layer_ref,       # SMEM (1,)
    lengths_ref,     # SMEM (B,) live positions per slot (inclusive count)
    q_ref,           # VMEM (1, H, HD)
    k_hbm,           # ANY  (L, B, S, KV*HD) int8 (position-major, flattened)
    v_hbm,           # ANY  (L, B, S, KV*HD) int8
    sc_hbm,          # ANY  (L, B, 2*KV, S) f32 scale-major view — k scales
    #                  in rows [:KV], v scales in rows [KV:]
    o_ref,           # VMEM (1, H, HD)
    *rest,           # [aliased k/v/scale passthrough outs] + scratch:
    #                  k_buf/v_buf (2, block_s, KV*HD) int8,
    #                  sc_buf (2, 2*KV, block_s) f32, DMA sems (2, 3)
    block_s: int,
    scale: float,
    num_kv: int,
    thread_cache: bool = False,
):
    """One grid program per SLOT covering ALL kv heads (r5 redesign).

    The r1-r4 kernel ran one program per (slot, kv-head) with 64 KB
    blocks: ~250 serialized DMAs per slot at 8k made it DMA-latency-bound
    (measured 18.7 ms/layer vs ~0.17 roofline, DECISIONS r4).  This one
    streams each slot's WHOLE position-major cache row — K and V blocks
    of (block_s, KV*HD) int8 (512 KB at block_s=512) — double-buffered,
    so per-block transfer time dominates issue latency and HBM traffic
    scales with each slot's LIVE length.

    All heads per block via a block-diagonal q: q_bd (H, KV*HD) holds
    head h*G+g's query in columns [kv(h)*HD, (kv(h)+1)*HD) and zeros
    elsewhere, so ONE (H, KV*HD) x (KV*HD, block_s) MXU dot yields every
    head's scores against its own kv head only (the ~KV x FLOP padding is
    noise next to the bandwidth cost).  Per-position k/v scales apply to
    SCORES and PROBS rather than the payload: a constant (H, KV) 0/1
    selection matrix times the (KV, block_s) scale rows broadcasts each
    kv head's scale onto its G query rows with one tiny MXU dot — no
    sublane-misaligned slicing, no 3-D broadcasts (Mosaic rejects both).
    The PV dot computes (H, KV*HD); the block-diagonal (H, HD) result is
    extracted with a static kv-head loop over 128-aligned lane slices.
    """
    if thread_cache:
        # aliased passthrough outputs share the input buffers; never
        # written (their contents ARE the cache)
        _k_out, _v_out, _sc_out, k_buf, v_buf, sc_buf, sem = rest
    else:
        k_buf, v_buf, sc_buf, sem = rest
    b = pl.program_id(0)
    li = layer_ref[0]
    length = lengths_ref[b]
    n_blocks = pl.cdiv(length, block_s)
    H = q_ref.shape[1]
    HD = q_ref.shape[2]
    G = H // num_kv
    DKV = num_kv * HD

    def dma(slot, blk, which):
        if which == 2:  # scale rows: lanes are positions in this view
            return pltpu.make_async_copy(
                sc_hbm.at[li, b, :, pl.ds(blk * block_s, block_s)],
                sc_buf.at[slot],
                sem.at[slot, 2],
            )
        src = (k_hbm, v_hbm)[which]
        dst = (k_buf, v_buf)[which]
        return pltpu.make_async_copy(
            src.at[li, b, pl.ds(blk * block_s, block_s), :],
            dst.at[slot],
            sem.at[slot, which],
        )

    def start_all(slot, blk):
        for w in range(3):
            dma(slot, blk, w).start()

    def wait_all(slot, blk):
        for w in range(3):
            dma(slot, blk, w).wait()

    @pl.when(n_blocks > 0)
    def _():
        start_all(0, 0)

    # head r = h*G + g attends kv head h: 2-D iota compares only
    head_kv = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) // G  # (H, 1)
    # block-diagonal query via 128-aligned lane concat (no 3-D reshape)
    q = q_ref[0].astype(jnp.float32) * scale  # (H, HD)
    q_bd = jnp.concatenate(
        [jnp.where(head_kv == h, q, 0.0) for h in range(num_kv)], axis=1
    )  # (H, KV*HD)
    # (H, KV) selection matrix: sel @ scale_rows broadcasts kv-head scales
    # onto query rows with one MXU dot
    sel = (
        head_kv == jax.lax.broadcasted_iota(jnp.int32, (H, num_kv), 1)
    ).astype(jnp.float32)

    def body(blk, state):
        m, l, acc = state
        slot = blk % 2

        @pl.when(blk + 1 < n_blocks)
        def _():
            start_all((blk + 1) % 2, blk + 1)

        wait_all(slot, blk)

        ksc = sc_buf[slot][:num_kv]   # (KV, block_s) — aligned row slices
        vsc = sc_buf[slot][num_kv:]
        k = k_buf[slot].astype(jnp.float32)  # (block_s, DKV) int8 -> f32
        v = v_buf[slot].astype(jnp.float32)

        s = jax.lax.dot_general(
            q_bd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, block_s) — block-diag zeros kill cross-head terms
        s = s * jax.lax.dot_general(
            sel, ksc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # k dequant applied to scores: s *= ksc[kv(row)]
        pos = blk * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < length, s, -1e30)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pw = p * jax.lax.dot_general(
            sel, vsc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # v dequant folded into probs
        pv = jax.lax.dot_general(
            pw, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, KV*HD); row h*G+g's true output lives in its kv block
        out = jnp.zeros((H, HD), jnp.float32)
        for h in range(num_kv):  # 128-aligned lane slices, static loop
            out = out + jnp.where(
                head_kv == h, pv[:, h * HD : (h + 1) * HD], 0.0
            )
        acc_new = acc * alpha + out
        return m_new, l_new, acc_new

    m0 = jnp.full((H, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((H, 1), jnp.float32)
    acc0 = jnp.zeros((H, HD), jnp.float32)
    m, l, acc = lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def decode_attention_int8_slots(
    q: jnp.ndarray,        # (B, H, HD)
    k_cache: jnp.ndarray,  # (L, B, S, KV, HD) int8 position-major
    v_cache: jnp.ndarray,  # (L, B, S, KV, HD) int8
    kv_scale: jnp.ndarray,  # (L, B, S, 2*KV) f32 (k in [:KV], v in [KV:])
    lengths: jnp.ndarray,  # (B,) live positions (inclusive count)
    layer: jnp.ndarray,    # () int32 — layer slice to attend over
    *,
    block_s: int = 512,
    interpret: bool = False,
    kv_scale_t: Optional[jnp.ndarray] = None,  # (L, B, 2*KV, S) f32 —
    # scale-major view; callers in a layer loop supply it to avoid a
    # per-layer transpose (llama_decode_step maintains one per step)
    thread_cache: bool = False,  # also return (k, v, scale_t) ALIASED
    # through the kernel — see below
):
    """Slot-wise flash decode attention over the INT8 position-major cache.

    The production long-context path (TPU answer to vLLM PagedAttention,
    reference engine_class.py:8,60-67): HBM traffic per step is
    sum(live lengths) * 2 KB — a 512-live slot co-batched with an 8k slot
    costs 512 positions, where the dense bucketed path reads the full
    8192-bucket for every slot.  Payloads stream AS int8 (half of bf16)
    and dequantize in registers against the per-position scales; no bf16
    copy of the cache is ever materialised.

    The scale array crosses into the kernel TRANSPOSED to (L, B, 2KV, S)
    ("scale-major"): Mosaic DMA cannot slice the 16-lane minor dim of the
    storage layout (tile width 128), but with positions as lanes the
    slice is (2KV, block_s) — sublane 16, lanes 128-aligned.

    ``thread_cache=True`` returns ``(attn, k_cache, v_cache, kv_scale_t)``
    with the cache arrays ALIASED through the kernel (input_output_aliases)
    untouched.  A decode layer loop interleaves cache writes
    (dynamic_update_slice) with kernel reads of the same buffers; XLA
    cannot prove in-place safety across an opaque custom call, so without
    threading it COPIES the multi-GB cache every layer (measured
    16.6 ms/layer at 8x8192 — the whole kernel win erased).  Threading
    makes the dataflow linear: write -> kernel(consume, return) -> write.
    """
    B, H, HD = q.shape
    if k_cache.ndim == 4:  # engine layout: flat (L, B, S, KV*HD)
        L, _, S, DKV = k_cache.shape
        KV = DKV // HD
        k5 = None
    else:  # test/legacy layout (L, B, S, KV, HD)
        L, _, S, KV, _ = k_cache.shape
        k5 = True
    scale = HD**-0.5
    block_s = min(block_s, S)
    if S % block_s != 0:
        # DMA blocks must tile the capacity exactly; irregular (test-sized)
        # capacities use the dense oracle on a dequantised slice.
        # ``interpret`` does NOT fall back: pallas interpret emulates the
        # DMA/semaphore machinery, so CPU tests exercise the real kernel.
        if k5 is None:  # fallback math wants split heads
            k_cache = k_cache.reshape(L, B, S, KV, HD)
            v_cache = v_cache.reshape(L, B, S, KV, HD)
        kl = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
        if kv_scale is None:
            kv_scale = jnp.swapaxes(kv_scale_t, 2, 3)
        scl = jax.lax.dynamic_index_in_dim(kv_scale, layer, 0, keepdims=False)
        kf = kl.astype(jnp.float32) * scl[..., :KV, None]
        vf = vl.astype(jnp.float32) * scl[..., KV:, None]
        # oracle layout is head-major (B, KV, S, HD)
        attn = decode_attention_reference(
            q, jnp.swapaxes(kf, 1, 2), jnp.swapaxes(vf, 1, 2), lengths
        )
        if thread_cache:
            if k5 is None:
                k_cache = k_cache.reshape(L, B, S, KV * HD)
                v_cache = v_cache.reshape(L, B, S, KV * HD)
            return attn, k_cache, v_cache, kv_scale_t
        return attn

    if kv_scale_t is None:
        kv_scale_t = jnp.swapaxes(kv_scale, 2, 3)  # (L, B, 2KV, S)
    DKV = KV * HD
    kc_flat = k_cache.reshape(L, B, S, DKV)
    vc_flat = v_cache.reshape(L, B, S, DKV)
    operands = [
        jnp.asarray(layer, jnp.int32)[None],
        lengths,
        q,
        kc_flat,
        vc_flat,
        kv_scale_t,
    ]
    in_specs = [
        pl.BlockSpec(
            (1, H, HD), lambda b, li, lens: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    attn_out_spec = pl.BlockSpec(
        (1, H, HD), lambda b, li, lens: (b, 0, 0), memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((2, block_s, DKV), jnp.int8),
        pltpu.VMEM((2, block_s, DKV), jnp.int8),
        pltpu.VMEM((2, 2 * KV, block_s), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 3)),
    ]
    kernel = functools.partial(
        _slot_attn_kernel, block_s=block_s, scale=scale, num_kv=KV,
        thread_cache=thread_cache,
    )
    if thread_cache:
        # cache operands alias straight through to outputs (flattened
        # input indices: 0 layer, 1 lengths, 2 q, 3 k, 4 v, 5 scale_t)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=in_specs,
            out_specs=[
                attn_out_spec,
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            scratch_shapes=scratch,
        )
        attn, k2, v2, sc2 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, H, HD), q.dtype),
                jax.ShapeDtypeStruct(kc_flat.shape, kc_flat.dtype),
                jax.ShapeDtypeStruct(vc_flat.shape, vc_flat.dtype),
                jax.ShapeDtypeStruct(kv_scale_t.shape, kv_scale_t.dtype),
            ],
            input_output_aliases={3: 1, 4: 2, 5: 3},
            interpret=interpret,
        )(*operands)
        return attn, k2, v2, sc2  # flat engine layout
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=attn_out_spec,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, HD), q.dtype),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def decode_attention(
    q: jnp.ndarray,        # (B, H, HD)
    k_cache: jnp.ndarray,  # (B, KV, S, HD)
    v_cache: jnp.ndarray,  # (B, KV, S, HD)
    lengths: jnp.ndarray,  # (B,)
    *,
    block_s: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, HD = q.shape
    KV, S = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    scale = HD**-0.5

    block_s = min(block_s, S)
    if S % block_s != 0:
        # DMA blocks must tile the cache exactly; fall back to the dense
        # oracle for irregular capacities (test-sized caches)
        return decode_attention_reference(q, k_cache, v_cache, lengths)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, HD), lambda b, lens: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, H, HD), lambda b, lens: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_s, HD), jnp.float32 if interpret else k_cache.dtype),
            pltpu.VMEM((2, block_s, HD), jnp.float32 if interpret else v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    # query head layout is already grouped: heads [h*G : (h+1)*G] attend to
    # kv head h (matches llama.py's reshape(B, KV, G, HD))
    kernel = functools.partial(
        _decode_attn_kernel, block_s=block_s, scale=scale, num_kv=KV
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, HD), q.dtype),
        interpret=interpret,
    )(lengths, q, k_cache, v_cache)
    return out
