"""Continuous-batching serving engine over a device-resident slot table.

Architecture (the TPU-idiomatic replacement for reference L1, SURVEY.md §7.4):

- A fixed-size **slot table** lives on device: dense KV cache
  ``[layers, slots, max_seq, kv_heads, head_dim]``, per-slot lengths,
  activity flags, sampling parameters and token-presence masks — one
  pytree, donated through every jitted update so XLA mutates it in place.
- **Admission** = a bucketed-prefill program writing the prompt's K/V into
  a free slot (one compile per bucket length, no dynamic shapes).
- **Decode** = one jitted step advancing *all* active slots together and
  sampling per-slot (temperature / top-p / repetition penalty).
- **Fused audio frames**: with a codec attached, the frame program also
  pushes sampled codes into an on-device per-slot ring and runs the
  batched streaming SNAC hop inside the same dispatch, so one readback
  per iteration carries the tokens AND the emitted PCM of up to
  ``frames_per_dispatch`` codec frames (DECISIONS r3-007/r3-008).
- **Eviction** (stop token, max_tokens, cancel/barge-in) clears the slot
  flags; co-batched requests are untouched — this is the KV analogue of
  the reference's generator-drop reset (llama_local.py:152-157).

The host loop is a single asyncio task; per-request token streams are
asyncio queues, mirroring the thread/queue bridges of the reference
(engine_class.py:103-134) without any threads.
"""
from __future__ import annotations

import asyncio
import dataclasses
import functools
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.stream_decode import (
    EMIT_SLOT,
    WINDOW_FRAMES,
    snac_stream_body,
)
from ..model.config import LlamaConfig, ORPHEUS_SPECIAL_TOKENS
from ..model.llama import (
    init_kv_cache,
    llama_decode_step,
    llama_forward,
    llama_prefill_chunk,
    llama_prefill_chunk_batch,
)
from ..model.sampling import SamplingParams, sample_logits
from .request import Request, RequestState

_AUDIO_BASE = ORPHEUS_SPECIAL_TOKENS["audio_base"]
_CODEBOOK = 4096
_FRAME_TOKENS = 7
# Per-slot custom stop ids live in a device array (B, _MAX_CUSTOM_STOPS) so
# novel per-request stop sets never recompile the frame program and one
# request's custom stop can never deactivate another's lane (the former
# static stop-id *union* had both defects).  Requests with more custom stops
# fall back to the host check in _deliver for the overflow ids.
_MAX_CUSTOM_STOPS = 8
_NO_CUSTOM_STOPS = np.full((_MAX_CUSTOM_STOPS,), -1, np.int32)

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_slots: int = 8
    max_seq_len: int = 2048
    prefill_buckets: Tuple[int, ...] = (32, 64, 128, 256, 512, 1024)
    # prompts longer than the largest prefill bucket are written in
    # fixed-size chunks, each attending to the cache history — no prompt
    # truncation up to max_seq_len (reference n_ctx 8192)
    prefill_chunk: int = 1024
    # chunk rounds HALVE once the attended history passes this depth:
    # deep-history rounds are what co-batched live streams stall on
    # during admission interleave (engine._plan_chunks)
    fine_chunk_hist: int = 4096
    # context buckets for the decode step: attention reads only the bucket
    # prefix of the KV cache, so HBM traffic follows the longest LIVE
    # context instead of allocated capacity (DECISIONS r1-011)
    context_buckets: Tuple[int, ...] = (256, 512, 1024, 2048, 4096, 8192)
    cache_dtype: str = "bfloat16"
    # "auto": int8 caches at context >= pallas_min_bucket select the
    # slot-wise pallas flash-decode kernel (r5 redesign: whole-slot
    # (block_s, KV*HD) int8 DMA, all kv heads per program, cache aliased
    # through the call) — measured 16.6 vs dense 17.8 ms/step at uniform
    # 8x8192 and 11.1 vs 17.5 at MIXED live lengths, because the
    # kernel's HBM traffic follows each slot's LIVE length while dense
    # reads the full bucket per slot.  Everything else (bf16 caches,
    # short contexts, CPU tests) stays on the dense bucketed einsum.
    attn_impl: str = "auto"
    # smallest context bucket at which attn_impl="auto" selects the slot-
    # wise pallas flash kernel on a quantized cache (see _attn_for)
    pallas_min_bucket: int = 2048
    # int8 activations in the chunk-prefill projections/MLP (w8a8): the
    # long-prompt admission wall is chunk-matmul-bound at 120 TFLOP/s
    # with weight-only dequant vs 169 w8a8 (DECISIONS r4-006).  Accuracy
    # gate: random-weight logit error vs the weight-only path is bounded
    # in tests/test_chunked_prefill.py and recorded in DECISIONS r5.
    # Applies to quantized weights only (bf16 engines are unaffected).
    prefill_w8a8: bool = True
    steps_per_sync: int = 0  # 0/auto -> 7 on TPU (one SNAC frame), 1 elsewhere
    # Max codec frames decoded per fused audio dispatch (0/auto -> 1).
    # Multi-frame batching existed to amortise the tunnel's ~26 ms
    # per-readback tax; the overlap loop hides that tax behind device
    # execution entirely, and the chip A/B (scripts/probe_fpd.py, ctx 512
    # batch 8) reads k=1: 11.5x RTF / 65 ms hop-gap p95 vs k=4: 10.9x /
    # 231 ms — k=1 is faster AND 3.5x smoother, so it is the default on
    # every backend.  >1 remains available for experiments.
    frames_per_dispatch: int = 0
    # The serving loop keeps ONE frame in flight: it dispatches frame N,
    # issues frame N's readback from a worker thread, and only then
    # processes frame N-1's (already fetched) results.  Readbacks wait for
    # everything queued at their ISSUE time — so a readback issued BEFORE
    # the next dispatch overlaps that dispatch's device execution, hiding
    # the tunnel's ~26 ms per-readback tax entirely (probe: 68.5 ->
    # 44.3 ms/iter; scripts/probe_overlap.py).  The r2 "dispatch-ahead"
    # pipeline issued the read AFTER the next dispatch and lost; issue
    # order, not dispatch depth, is what matters on this transport.
    # Backpressure: a slot whose consumer queue is this deep is gated out of
    # decode dispatches (its KV slot is kept; generation resumes when the
    # consumer drains).  A stalled client therefore buffers at most
    # ~max_queued_hops of audio instead of the whole utterance — the engine
    # analogue of the reference's pull-per-chunk pacing (core.py:88-117).
    max_queued_hops: int = 24       # audio mode: ~2 s of PCM at 85 ms hops
    max_queued_tokens: int = 512    # token mode
    # Band-agnostic token->code mapping (code = (id-base) % 4096 for any id
    # in the 7*4096 audio range).  For benches/demos on random weights,
    # which sample audio-range ids in arbitrary sub-bands; real checkpoints
    # emit strictly banded ids and keep the exact parser.
    lenient_audio_codes: bool = False
    # Constrain every audio lane's sampling to its CURRENT position's
    # 4096-id band (id in [base + (audio_pos%7)*4096, +4096)): random
    # weights then emit exactly the banded traces a real checkpoint does,
    # so the STRICT per-position parser (adapters/runtime.py
    # audio_code_from_token_id, reference speechpipe.py:146-189) runs
    # under load instead of only in unit tests (VERDICT r4 next #3).
    # A bench/testing device: real checkpoints emit banded ids natively.
    banded_sampling: bool = False
    default_stop_ids: Tuple[int, ...] = (
        ORPHEUS_SPECIAL_TOKENS["end_of_speech"],
        ORPHEUS_SPECIAL_TOKENS["end_of_text"],
    )


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


# ----------------------------------------------------------- jitted kernels


def _band_mask_logits(logits, is_audio, audio_pos):
    """Mask (B, Vp) logits to each audio lane's CURRENT 4096-id band.

    Band index = audio_pos % 7 (the device ring's running audio-token
    position, advanced by _ring_push only on accepted codes), matching
    the reference's id = N - 10 - (pos%7)*4096 contract
    (speechpipe.py:146-189).  Text lanes pass through unmasked."""
    lane = jnp.arange(logits.shape[1])[None, :]
    lo = _AUDIO_BASE + (audio_pos % _FRAME_TOKENS) * _CODEBOOK
    in_band = (lane >= lo[:, None]) & (lane < (lo + _CODEBOOK)[:, None])
    keep = jnp.where(is_audio[:, None], in_band, True)
    return jnp.where(keep, logits, -jnp.inf)


def _ring_seed(dstate, slot, tok, is_audio, lenient: bool):
    """Push the prefill's first sampled token into the device code ring
    (audio lanes only): the fused frame program must see every code the
    host routes, and the first token is sampled by the prefill program,
    not by a frame dispatch."""
    if "ring" not in dstate:
        return dstate
    valid, code = _audio_code(tok[None], dstate["audio_pos"][slot][None],
                              lenient)
    valid = valid[0] & is_audio
    code = code[0]
    inc = valid.astype(jnp.int32)
    dstate["partial"] = dstate["partial"].at[slot, 0].set(
        jnp.where(valid, code, dstate["partial"][slot, 0])
    )
    dstate["pcnt"] = dstate["pcnt"].at[slot].add(inc)
    dstate["audio_pos"] = dstate["audio_pos"].at[slot].add(inc)
    return dstate


def _seed_slot_state(dstate, slot, samp, allowed, is_audio, custom_stops,
                     rng_next):
    """Per-slot serving state written at admission.

    ``allowed`` is the request's TOTAL generation budget (max_tokens
    clamped by the context-margin headroom, computed on the host);
    the prefill samples the first token, so the device-side countdown
    starts at ``allowed - 1`` and the lane only activates when more
    than one token is allowed.  The device deactivating a lane at
    remaining==0 is what keeps the fused codec ring in lockstep with
    the host StreamPlanner on budget-terminated streams — without it,
    post-budget device frames would advance the SNAC commit frontier
    past the planner and corrupt end-of-stream flush audio.
    """
    dstate["temp"] = dstate["temp"].at[slot].set(samp[0])
    dstate["top_p"] = dstate["top_p"].at[slot].set(samp[1])
    dstate["rep_pen"] = dstate["rep_pen"].at[slot].set(samp[2])
    dstate["active"] = dstate["active"].at[slot].set(allowed > 1)
    dstate["remaining"] = dstate["remaining"].at[slot].set(allowed - 1)
    dstate["is_audio"] = dstate["is_audio"].at[slot].set(is_audio)
    dstate["custom_stops"] = dstate["custom_stops"].at[slot].set(custom_stops)
    kd = jax.random.key_data
    dstate["rng"] = jax.random.wrap_key_data(
        kd(dstate["rng"]).at[slot].set(kd(rng_next))
    )
    return dstate


def _post_step(dstate, toks, stop_ids: Tuple[int, ...]):
    """Device-side lane termination after one sampled step.

    A lane stops when it emits a default stop id (static, engine-wide),
    one of its own custom stop ids (per-slot device array), or exhausts
    its generation budget.  ``toks`` reads -1 for gated/inactive lanes.
    """
    emitted = toks >= 0
    is_stop = emitted & jnp.any(
        toks[:, None] == dstate["custom_stops"], axis=1
    )
    for s in stop_ids:
        is_stop = is_stop | (toks == s)
    remaining = dstate["remaining"] - emitted.astype(jnp.int32)
    dstate["remaining"] = remaining
    dstate["active"] = dstate["active"] & ~is_stop & (remaining > 0)
    return dstate


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "hist_bucket", "sample", "lenient", "w8a8",
                     "banded"),
    donate_argnums=(1,),
)
def _prefill_chunk(
    params,
    dstate,
    tokens: jnp.ndarray,      # (S,) one (padded) prompt chunk
    length: jnp.ndarray,      # () real tokens in this chunk
    offset: jnp.ndarray,      # () chunk start position
    slot: jnp.ndarray,        # () target slot
    samp: jnp.ndarray,        # (3,) temperature, top_p, repetition_penalty
    key: jax.Array,
    is_audio: jnp.ndarray = False,  # () bool — audio-mode request
    allowed: jnp.ndarray = 2**30,   # () int32 total generation budget
    custom_stops: jnp.ndarray = _NO_CUSTOM_STOPS,  # (M,) int32, -1 pad
    *,
    cfg: LlamaConfig,
    hist_bucket: int,
    sample: bool,
    lenient: bool = False,
    w8a8: bool = False,
    banded: bool = False,
):
    """Write one prompt chunk; on the final chunk, sample the first token."""
    S = tokens.shape[0]
    logits, cache = llama_prefill_chunk(
        params,
        tokens,
        cfg,
        dstate["cache"],
        offset,
        slot,
        length,
        hist_bucket=hist_bucket,
        w8a8=w8a8,
    )
    # mark this chunk's real tokens seen for the repetition penalty
    presence = dstate["presence"]
    mask = jnp.arange(S) < length
    row = presence[slot]
    row = row.at[tokens].set(jnp.where(mask, True, row[tokens]))
    presence = presence.at[slot].set(row)

    dstate = dict(dstate)
    dstate["cache"] = cache
    if not sample:
        dstate["presence"] = presence
        return dstate, jnp.zeros((), jnp.int32) - 1

    use, nxt = jax.random.split(key)
    if banded:  # first audio code samples from band 0 (audio_pos == 0)
        logits = _band_mask_logits(
            logits[None], is_audio[None], jnp.zeros((1,), jnp.int32)
        )[0]
    first = sample_logits(
        logits[None],
        use,
        temperature=samp[0][None],
        top_p=samp[1][None],
        repetition_penalty=samp[2][None],
        presence=presence[slot][None],
        vocab_size=cfg.vocab_size,
    )[0]
    presence = presence.at[slot, first].set(True)
    dstate["presence"] = presence
    dstate["lengths"] = dstate["lengths"].at[slot].set(offset + length)
    dstate["last_tokens"] = dstate["last_tokens"].at[slot].set(first)
    dstate = _seed_slot_state(dstate, slot, samp, allowed, is_audio,
                              custom_stops, nxt)
    dstate = _ring_seed(dstate, slot, first, is_audio, lenient)
    return dstate, first


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "hist_bucket", "sample", "lenient", "w8a8",
                     "banded"),
    donate_argnums=(1,),
)
def _prefill_chunk_batch(
    params,
    dstate,
    tokens: jnp.ndarray,       # (J, C) one (padded) chunk per job
    lengths: jnp.ndarray,      # (J,) real tokens in each chunk
    offsets: jnp.ndarray,      # (J,) chunk start positions
    slots: jnp.ndarray,        # (J,) target slots
    samps: jnp.ndarray,        # (J, 3) temperature, top_p, rep_penalty
    keys: jax.Array,           # (J,) per-request admission keys
    is_audio: jnp.ndarray,     # (J,) bool
    allowed: jnp.ndarray,      # (J,) int32 generation budgets
    custom_stops: jnp.ndarray,  # (J, M) int32, -1 pad
    *,
    cfg: LlamaConfig,
    hist_bucket: int,
    sample: bool,
    lenient: bool = False,
    w8a8: bool = False,
    banded: bool = False,
):
    """Chunked-prefill round for a LOCKSTEP group of J long prompts.

    One dispatch instead of J (llama_prefill_chunk_batch); on final
    chunks every job's first token is sampled from its own key chain.
    """
    J, C = tokens.shape
    logits, cache = llama_prefill_chunk_batch(
        params, tokens, cfg, dstate["cache"], offsets, slots, lengths,
        hist_bucket=hist_bucket, w8a8=w8a8,
    )
    presence = dstate["presence"]
    mask = jnp.arange(C)[None, :] < lengths[:, None]  # (J, C)
    rows = presence[slots]  # (J, Vp)
    rows = rows.at[jnp.arange(J)[:, None], tokens].set(
        jnp.where(mask, True, rows[jnp.arange(J)[:, None], tokens])
    )
    presence = presence.at[slots].set(rows)

    dstate = dict(dstate)
    dstate["cache"] = cache
    if not sample:
        dstate["presence"] = presence
        return dstate, jnp.full((J,), -1, jnp.int32)

    pair = jax.vmap(lambda k: jax.random.split(k))(keys)  # (J, 2)
    if banded:  # first audio codes sample from band 0
        logits = _band_mask_logits(
            logits, is_audio, jnp.zeros((J,), jnp.int32)
        )
    first = sample_logits(
        logits,
        pair[:, 0],
        temperature=samps[:, 0],
        top_p=samps[:, 1],
        repetition_penalty=samps[:, 2],
        presence=presence[slots],
        vocab_size=cfg.vocab_size,
    )  # (J,)
    presence = presence.at[slots, first].set(True)
    dstate["presence"] = presence
    dstate["lengths"] = dstate["lengths"].at[slots].set(offsets + lengths)
    dstate["last_tokens"] = dstate["last_tokens"].at[slots].set(first)
    dstate["temp"] = dstate["temp"].at[slots].set(samps[:, 0])
    dstate["top_p"] = dstate["top_p"].at[slots].set(samps[:, 1])
    dstate["rep_pen"] = dstate["rep_pen"].at[slots].set(samps[:, 2])
    dstate["active"] = dstate["active"].at[slots].set(allowed > 1)
    dstate["remaining"] = dstate["remaining"].at[slots].set(allowed - 1)
    dstate["is_audio"] = dstate["is_audio"].at[slots].set(is_audio)
    dstate["custom_stops"] = dstate["custom_stops"].at[slots].set(custom_stops)
    kd = jax.random.key_data
    dstate["rng"] = jax.random.wrap_key_data(
        kd(dstate["rng"]).at[slots].set(kd(pair[:, 1]))
    )
    if "ring" in dstate:
        # first sampled codes enter the device ring exactly as a decode
        # step's would: a (B,) token row with -1 for non-participating
        # slots (ring_push ignores them via the is_audio/validity gates)
        B = dstate["active"].shape[0]
        toks_row = jnp.full((B,), -1, jnp.int32).at[slots].set(first)
        dstate = _ring_push(dstate, toks_row, lenient)
    return dstate, first


def _decode_core(params, dstate, gate, cfg: LlamaConfig, attn_impl: str,
                 bucket: Optional[int] = None, banded: bool = False):
    """One decode+sample step over the slot table (shared by both jits).

    ``gate`` (B,) bool is the per-dispatch backpressure mask: gated-off
    slots neither advance nor emit (toks read -1) but keep their device
    state — unlike ``active``, which is persistent slot liveness.

    Sampling draws from each slot's OWN key chain (``dstate["rng"]``,
    seeded at admission), advanced only on steps where the lane emits —
    so a seeded request's trace is a pure function of (seed, prompt,
    sampling params), independent of co-batched traffic, backpressure
    gating or dispatch scheduling.
    """
    active = dstate["active"] & gate
    logits, cache = llama_decode_step(
        params,
        dstate["last_tokens"],
        cfg,
        dstate["cache"],
        dstate["lengths"],
        active=active,
        attn_impl=attn_impl,
        bucket=bucket,
    )
    if banded:  # audio engines only: dstate carries the codec ring
        logits = _band_mask_logits(
            logits, dstate["is_audio"], dstate["audio_pos"]
        )
    pair = jax.vmap(lambda k: jax.random.split(k))(dstate["rng"])  # (B, 2)
    toks = sample_logits(
        logits,
        pair[:, 0],
        temperature=dstate["temp"],
        top_p=dstate["top_p"],
        repetition_penalty=dstate["rep_pen"],
        presence=dstate["presence"],
        vocab_size=cfg.vocab_size,
    )
    toks = jnp.where(active, toks, 0)

    B = toks.shape[0]
    batch_idx = jnp.arange(B)
    presence = dstate["presence"]
    presence = presence.at[batch_idx, toks].set(
        jnp.where(active, True, presence[batch_idx, toks])
    )
    dstate = dict(dstate)
    dstate["cache"] = cache
    dstate["presence"] = presence
    dstate["lengths"] = dstate["lengths"] + active.astype(jnp.int32)
    dstate["last_tokens"] = jnp.where(active, toks, dstate["last_tokens"])
    kd = jax.random.key_data
    dstate["rng"] = jax.random.wrap_key_data(
        jnp.where(active[..., None], kd(pair[:, 1]), kd(dstate["rng"]))
    )
    return dstate, jnp.where(active, toks, -1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "bucket", "stop_ids"),
    donate_argnums=(1,),
)
def _decode(params, dstate, gate=None, *, cfg: LlamaConfig,
            attn_impl: str = "dense", bucket: Optional[int] = None,
            stop_ids: Tuple[int, ...] = ()):
    """Advance every active (and ungated) slot by one token."""
    if gate is None:
        gate = jnp.ones(dstate["active"].shape, jnp.bool_)
    dstate, toks = _decode_core(params, dstate, gate, cfg, attn_impl,
                                bucket)
    dstate = _post_step(dstate, toks, stop_ids)
    return dstate, toks


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "n_steps", "stop_ids", "bucket"),
    donate_argnums=(1,),
)
def _decode_multi(
    params,
    dstate,
    gate=None,
    *,
    cfg: LlamaConfig,
    attn_impl: str,
    n_steps: int,
    stop_ids: Tuple[int, ...],
    bucket: Optional[int] = None,
):
    """Advance all slots by up to ``n_steps`` tokens in ONE dispatch.

    Amortises the per-dispatch host/tunnel overhead (measured ~6 ms on the
    axon backend) across a full 7-token SNAC frame.  Slots that emit a stop
    token are deactivated on-device so later steps in the same dispatch
    don't extend them; their remaining outputs read -1.
    """
    if gate is None:
        gate = jnp.ones(dstate["active"].shape, jnp.bool_)

    def body(dstate, _):
        dstate, toks = _decode_core(params, dstate, gate, cfg, attn_impl,
                                    bucket)
        dstate = _post_step(dstate, toks, stop_ids)
        return dstate, toks

    dstate, toks = jax.lax.scan(body, dstate, None, length=n_steps)
    return dstate, toks  # toks (n_steps, B)


def _audio_code(toks, audio_pos, lenient: bool):
    """(valid, code) for one step's sampled tokens (B,) — device-side
    mirror of adapters.runtime.{audio_code_from_token_id,lenient_audio_code}."""
    off = toks - _AUDIO_BASE
    if lenient:
        valid = (off >= 0) & (off < _FRAME_TOKENS * _CODEBOOK)
        code = off % _CODEBOOK
    else:
        code = off - (audio_pos % _FRAME_TOKENS) * _CODEBOOK
        valid = (code >= 0) & (code < _CODEBOOK)
    valid = valid & (toks >= 0)
    return valid, jnp.where(valid, code, 0)


def _ring_push(dstate, toks, lenient: bool):
    """Append one step's sampled codes to the per-slot device code ring.

    Ring layout: ``ring`` (B, 28) holds the last WINDOW_FRAMES completed
    frames (newest last); ``partial``/``pcnt`` the in-progress frame;
    ``fcnt`` completed-frame count; ``audio_pos`` the running audio-token
    index (for strict per-position banding); ``frame_done`` whether any
    frame completed during the current dispatch.  A dispatch delivers at
    most 7 new codes per slot, so at most ONE frame completes per slot
    per dispatch (6 leftover + 7 new = 13 < 14).
    """
    valid, code = _audio_code(toks, dstate["audio_pos"], lenient)
    # text-mode lanes co-batched with audio streams must never enter the
    # ring: a high-temperature text request can sample in-band ids, which
    # would advance fcnt and trigger SNAC commits nobody consumes.
    valid = valid & dstate["is_audio"]
    pcnt = dstate["pcnt"]
    sel = jnp.arange(_FRAME_TOKENS)[None, :] == pcnt[:, None]
    partial = jnp.where(valid[:, None] & sel, code[:, None], dstate["partial"])
    pcnt2 = pcnt + valid.astype(jnp.int32)
    done = pcnt2 >= _FRAME_TOKENS
    dstate["ring"] = jnp.where(
        done[:, None],
        jnp.concatenate([dstate["ring"][:, _FRAME_TOKENS:], partial], axis=1),
        dstate["ring"],
    )
    dstate["partial"] = jnp.where(done[:, None], 0, partial)
    dstate["pcnt"] = jnp.where(done, 0, pcnt2)
    dstate["fcnt"] = dstate["fcnt"] + done.astype(jnp.int32)
    dstate["audio_pos"] = dstate["audio_pos"] + valid.astype(jnp.int32)
    dstate["frame_done"] = dstate["frame_done"] | done
    return dstate


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "snac_cfg", "attn_impl", "n_steps", "stop_ids", "bucket",
        "lenient", "n_frames", "banded",
    ),
    donate_argnums=(1, 3),
)
def _decode_audio_multi(
    params,
    dstate,
    snac_params,
    snac_state,
    gate=None,
    *,
    cfg: LlamaConfig,
    snac_cfg,
    attn_impl: str,
    n_steps: int,
    stop_ids: Tuple[int, ...],
    bucket: Optional[int] = None,
    lenient: bool = False,
    n_frames: int = 1,
    banded: bool = False,
):
    """FUSED frame program: decode + sample + code ring + SNAC hops.

    Runs ``n_frames`` frame phases; each phase advances all slots by up
    to ``n_steps`` tokens, pushes each step's audio codes into the
    on-device ring, and — for every lane that completed a codec frame —
    runs ONE batched streaming SNAC hop.  Tokens and the emitted PCM of
    every phase come back together:

        (dstate, snac_state, toks (n_frames * n_steps, B),
         pcm (n_frames, B, frame_samples) int16, emit (n_frames, B) bool)

    Head lanes (first completed frame) decode the replicated window
    ``[f0 f0 f0 f0]`` with ``commit=False`` and emit window slot 0;
    steady lanes (>= WINDOW_FRAMES frames) decode the true last-4-frame
    window with ``commit=True`` and emit slot ``EMIT_SLOT`` — exactly the
    host ``StreamPlanner`` schedule, computed on device so one dispatch
    and ONE readback carry whole frames' tokens AND audio.  (The axon
    tunnel charges ~25-40 ms per host-blocking readback — measured
    device time 46 ms/frame vs 72 ms dispatch+readback — so host-side
    window assembly, which needs the tokens back first, put two to three
    of those latencies in every frame; fusing removes all but one, and
    ``n_frames > 1`` amortises the last one across frames.)

    Reference counterpart: tokens_decoder's incremental 7-token framing
    (Morpheus_Client/tts_engine/speechpipe.py:191-260) fused with the
    decode loop it feeds from (llama_local.py:62-87).
    """
    if gate is None:
        gate = jnp.ones(dstate["active"].shape, jnp.bool_)

    def body(dstate, _):
        dstate, toks = _decode_core(params, dstate, gate, cfg, attn_impl,
                                    bucket, banded)
        dstate = _post_step(dstate, toks, stop_ids)
        dstate = _ring_push(dstate, toks, lenient)
        return dstate, toks

    B = dstate["active"].shape[0]
    fs = snac_cfg.frame_samples

    def frame_phase(carry, _):
        dstate, snac_state = carry
        dstate = dict(dstate)
        dstate["frame_done"] = jnp.zeros_like(dstate["frame_done"])
        dstate, toks = jax.lax.scan(body, dstate, None, length=n_steps)

        done = dstate["frame_done"]
        fcnt = dstate["fcnt"]
        head = done & (fcnt == 1)
        steady = done & (fcnt >= WINDOW_FRAMES)
        newest = dstate["ring"][:, -_FRAME_TOKENS:]
        window = jnp.where(
            head[:, None],
            jnp.tile(newest, (1, WINDOW_FRAMES)),
            dstate["ring"],
        )
        pcm_win, snac_state = snac_stream_body(
            snac_params, window, snac_state, steady, cfg=snac_cfg
        )
        ws = jnp.where(head, 0, EMIT_SLOT)
        pcm = pcm_win.reshape(B, WINDOW_FRAMES, fs)[jnp.arange(B), ws]
        emit = head | steady
        pcm = jnp.where(emit[:, None], pcm, 0)
        return (dstate, snac_state), (toks, pcm, emit)

    (dstate, snac_state), (toks, pcm, emit) = jax.lax.scan(
        frame_phase, (dstate, snac_state), None, length=n_frames
    )
    toks = toks.reshape(n_frames * n_steps, B)
    return dstate, snac_state, toks, pcm, emit


@functools.partial(jax.jit, donate_argnums=(0,))
def _release(dstate, slot_mask: jnp.ndarray):
    """Free slots (stop / cancel / barge-in); leaves other slots untouched."""
    dstate = dict(dstate)
    dstate["active"] = jnp.where(slot_mask, False, dstate["active"])
    dstate["lengths"] = jnp.where(slot_mask, 0, dstate["lengths"])
    dstate["remaining"] = jnp.where(slot_mask, 0, dstate["remaining"])
    dstate["is_audio"] = jnp.where(slot_mask, False, dstate["is_audio"])
    dstate["custom_stops"] = jnp.where(
        slot_mask[:, None], -1, dstate["custom_stops"]
    )
    dstate["presence"] = jnp.where(
        slot_mask[:, None], False, dstate["presence"]
    )
    if "ring" in dstate:  # audio-fused engines: clear the codec ring too
        for k in ("ring", "partial"):
            dstate[k] = jnp.where(slot_mask[:, None], 0, dstate[k])
        for k in ("pcnt", "fcnt", "audio_pos"):
            dstate[k] = jnp.where(slot_mask, 0, dstate[k])
        dstate["frame_done"] = jnp.where(
            slot_mask, False, dstate["frame_done"]
        )
    return dstate


# ------------------------------------------------------------------- engine


class OrpheusEngine:
    """Async continuous-batching engine producing per-request token streams."""

    def __init__(
        self,
        params,
        model_cfg: LlamaConfig,
        engine_cfg: Optional[EngineConfig] = None,
        *,
        codec: Optional[tuple] = None,  # (snac_params, SNACConfig): audio mode
        mesh=None,  # jax.sharding.Mesh (data, model): TP/DP-sharded serving
        seed: int = 0,
    ) -> None:
        from ..model.quant import fuse_layer_weights

        self.mesh = mesh
        tp = mesh is not None and dict(mesh.shape).get("model", 1) > 1
        if tp:
            # Megatron TP shards q/k/v on head boundaries; a naively fused
            # wqkv column-sharded over `model` would split mid-head.  Keep
            # the canonical separate layout when tensor-sharded.
            self.params = params
        else:
            # serving-time projection fusion (wqkv / wgu): fewer, larger MXU
            # dispatches per layer; numerically identical (quant.py docstring)
            self.params = fuse_layer_weights(params)
        self.cfg = model_cfg
        self._codec = codec
        self.ecfg = engine_cfg or EngineConfig()
        from ..model.quant import is_quantized

        # w8a8 chunk prefill only does anything on quantized weights;
        # resolving it here keeps one static value across warmup/serving
        self._w8a8 = bool(self.ecfg.prefill_w8a8) and any(
            is_quantized(w) for w in self.params["layers"].values()
        )
        B = self.ecfg.max_slots
        Vp = model_cfg.padded_vocab
        cache_dt = jnp.dtype(self.ecfg.cache_dtype)
        self.dstate = {
            "cache": init_kv_cache(model_cfg, B, self.ecfg.max_seq_len, cache_dt),
            "lengths": jnp.zeros((B,), jnp.int32),
            "active": jnp.zeros((B,), jnp.bool_),
            "remaining": jnp.zeros((B,), jnp.int32),
            "is_audio": jnp.zeros((B,), jnp.bool_),
            "custom_stops": jnp.full((B, _MAX_CUSTOM_STOPS), -1, jnp.int32),
            # per-slot sampling key chains; reseeded at every admission
            # (SamplingParams.seed or a draw from the engine stream)
            "rng": jax.random.split(jax.random.key(seed), B),
            "last_tokens": jnp.zeros((B,), jnp.int32),
            "presence": jnp.zeros((B, Vp), jnp.bool_),
            "temp": jnp.zeros((B,), jnp.float32),
            "top_p": jnp.ones((B,), jnp.float32),
            "rep_pen": jnp.ones((B,), jnp.float32),
        }
        if codec is not None:
            # on-device codec ring for the fused frame program (_ring_push)
            self.dstate.update({
                "ring": jnp.zeros((B, WINDOW_FRAMES * _FRAME_TOKENS),
                                  jnp.int32),
                "partial": jnp.zeros((B, _FRAME_TOKENS), jnp.int32),
                "pcnt": jnp.zeros((B,), jnp.int32),
                "fcnt": jnp.zeros((B,), jnp.int32),
                "audio_pos": jnp.zeros((B,), jnp.int32),
                "frame_done": jnp.zeros((B,), jnp.bool_),
            })
        if mesh is not None:
            from ..parallel.sharding import (
                engine_state_shardings,
                param_shardings,
                shardings_like,
            )

            # int8 weights shard like their bf16 counterparts: the int8
            # payload takes the weight spec and the per-output-column scale
            # the spec minus the contraction axis (shardings_like); for
            # row-sharded (wo/wd) projections the replicated scale commutes
            # with the partial-sum reduction, so scale-after-psum equals
            # psum-of-scaled.  TP x int8 greedy traces are equality-tested
            # against the unsharded engine (tests/test_parallel.py).
            pshard = param_shardings(
                model_cfg, mesh, mode="tp" if tp else "replicated"
            )
            self.params = jax.device_put(
                self.params, shardings_like(self.params, pshard)
            )
            self.dstate = jax.device_put(
                self.dstate,
                engine_state_shardings(
                    mesh,
                    quantized_cache="scale" in self.dstate["cache"],
                    audio_ring="ring" in self.dstate,
                ),
            )
        self._snac_state = None
        if codec is not None:
            from ..codec.stream_decode import init_stream_state

            self._snac_state = init_stream_state(codec[1], B)
        # end-of-stream flush hops (the only host-dispatched SNAC work —
        # steady/head hops run inside the fused frame program): entries
        # ("pcm", device_pcm, [(slot, req, ws)]) in dispatch order, or
        # ("eos", req) once a stream's final hop has been dispatched.
        self._pending_audio: List[tuple] = []
        self._key = jax.random.key(seed)
        self.attn_impl = self.ecfg.attn_impl
        self._on_tpu = jax.default_backend() == "tpu"
        self.steps_per_sync = self.ecfg.steps_per_sync
        if self.steps_per_sync <= 0:
            self.steps_per_sync = 7 if jax.default_backend() == "tpu" else 1
        self.frames_per_dispatch = self.ecfg.frames_per_dispatch
        if self.frames_per_dispatch <= 0:
            self.frames_per_dispatch = 1
        self._free: List[int] = list(range(B))
        self._by_slot: Dict[int, Request] = {}
        # largest batched-prefill width warmed (warmup sets it); caps the
        # power-of-two group quantisation in _advance_prefill
        self._max_batch_j: int = 0
        # async admission: first tokens sampled by an in-flight prefill,
        # read back together with the next frame instead of stalling the
        # dispatch cadence on a host<->device sync (VERDICT r1 "next" #5)
        self._pending_first: List[tuple] = []  # (slot, req, device scalar)
        # long-prompt admissions in progress: at most ONE prefill chunk is
        # dispatched between decode frames, so an 8k admission costs
        # <= 1 chunk-time of cadence per frame instead of ~6 back-to-back
        # chunk programs stalling co-batched streams
        self._prefill_jobs: List[dict] = []
        # codec lanes awaiting a (batched) reset — see _admit
        self._pending_lane_resets: set = set()
        # Dedicated readback workers: the frame readback and any flush-hop
        # readbacks must ENTER the tunnel promptly and in issue order (a
        # shared default executor could delay one behind unrelated work,
        # and a late-issued readback waits for every program dispatched
        # in the meantime).  Two in-flight reads (frame + hops) suffice.
        import concurrent.futures

        self._readback_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="engine-readback"
        )
        self._pending: "asyncio.Queue[Request]" = asyncio.Queue()
        self._wake = asyncio.Event()
        self._task: Optional[asyncio.Task] = None
        self._closed = False
        self.steps = 0

    # ------------------------------------------------------------------ api

    @property
    def supports_audio(self) -> bool:
        return self._codec is not None

    def warmup(self, prompt_lens: Sequence[int] = (),
               max_new_tokens: int = 0, burst: int = 1) -> int:
        """Pre-compile every serving program reachable for the given
        workload: prefill buckets, chunked-prefill (chunk, history-bucket)
        programs, the decode frame program for every context bucket a
        stream can traverse while generating ``max_new_tokens`` — at both
        frame-batching factors the adaptive dispatcher uses — plus the
        end-of-stream flush-hop codec program and the slot-release program.

        Serving latency must never include an XLA compile: a context
        bucket first crossed mid-stream would otherwise freeze every
        co-batched stream for the compile's duration (the r3 bench's
        ctx-512 row crossed into a cold bucket mid-row and spent ~40 s of
        its measured wall compiling).  vLLM warms its CUDA graphs at
        startup for the same reason.

        ``burst`` warms the batched prefill programs for simultaneous
        arrivals of that width: a cold burst admits whole, its jobs stay
        in lockstep, and _advance_prefill dispatches each round at
        power-of-two J widths up to the warmed burst.

        Runs each program once on the live (idle) slot table with every
        lane inactive — compute is dispatched but no slot state survives:
        all slots are released afterwards.  Call before serving traffic,
        never with requests in flight.  Returns the number of programs
        exercised.
        """
        assert not self._by_slot and self._pending.empty(), (
            "warmup must run on an idle engine"
        )
        stop_ids = tuple(sorted(self.ecfg.default_stop_ids))
        # arg construction mirrors _admit exactly — a dtype/weak-type
        # mismatch would trace a different (uncached) program
        samp = jnp.asarray(np.asarray([0.6, 0.9, 1.1], np.float32))
        slot0 = jnp.asarray(0, jnp.int32)
        is_audio = np.asarray(False)
        no_budget = np.asarray(1, np.int32)  # lane stays inactive
        stops = np.full((_MAX_CUSTOM_STOPS,), -1, np.int32)
        # serving always passes the gate as a (B,) bool ARRAY; warming with
        # None would trace a structurally different (uncached) program
        gate = jnp.ones((self.ecfg.max_slots,), jnp.bool_)
        key = jax.random.key(0)
        n = self.steps_per_sync
        k_max = self.frames_per_dispatch
        top_bucket = max(self.ecfg.prefill_buckets)
        cbuckets = sorted(
            b for b in self.ecfg.context_buckets if b <= self.ecfg.max_seq_len
        )
        programs = 0

        burst = max(1, min(burst, self.ecfg.max_slots))
        chunk_programs = set()  # (chunk_len_bucket, hist_bucket, sample, J)
        decode_programs = set()  # (bucket, k)
        # _advance_prefill dispatches lockstep groups at POWER-OF-TWO
        # widths capped at the warmed burst; warm exactly that ladder
        pow2_js = {1 << i for i in range(burst.bit_length())
                   if (1 << i) <= burst}
        short_js = long_js = pow2_js
        self._max_batch_j = max(pow2_js)
        for L in prompt_lens:
            L = min(L, self.ecfg.max_seq_len - 4)
            if L <= top_bucket:
                rb = _bucket_for(L, self.ecfg.prefill_buckets)
                for j in short_js:
                    chunk_programs.add(
                        (rb, self._hist_bucket(rb), True, j)
                    )
            else:
                # the warmed set mirrors _plan_chunks exactly — one
                # source of truth for chunk widths and history buckets;
                # both the fine (live-traffic) and coarse (cold-burst)
                # plans are warmed, since admission picks per job
                for fine in (True, False):
                    for _off, clen, hist, final in self._plan_chunks(
                            L, fine=fine):
                        for j in long_js:
                            chunk_programs.add((clen, hist, final, j))
            lag = n + n * k_max + 2
            start = min(L + lag, self.ecfg.max_seq_len)
            end = min(L + max_new_tokens + lag, self.ecfg.max_seq_len)
            ks = sorted({1, k_max})
            for b in cbuckets:
                if b >= start:
                    for k in ks:
                        decode_programs.add((b, k))
                if b >= end:
                    break

        for clen, hb, sample, j in sorted(chunk_programs):
            if j == 1:
                self.dstate, _ = _prefill_chunk(
                    self.params, self.dstate,
                    jnp.asarray(np.zeros((clen,), np.int32)),
                    jnp.asarray(1, jnp.int32),
                    jnp.asarray(0, jnp.int32), slot0, samp, key,
                    is_audio, no_budget, stops,
                    cfg=self.cfg, hist_bucket=hb, sample=sample,
                    lenient=self.ecfg.lenient_audio_codes,
                    w8a8=self._w8a8,
                    banded=self.ecfg.banded_sampling,
                )
            else:
                self.dstate, _ = _prefill_chunk_batch(
                    self.params, self.dstate,
                    jnp.asarray(np.zeros((j, clen), np.int32)),
                    jnp.asarray(np.ones((j,), np.int32)),
                    jnp.asarray(np.zeros((j,), np.int32)),
                    jnp.asarray(np.arange(j, dtype=np.int32)),
                    jnp.asarray(np.tile(np.asarray([0.6, 0.9, 1.1],
                                                   np.float32), (j, 1))),
                    jax.random.split(key, j),
                    np.zeros((j,), bool),
                    np.ones((j,), np.int32),
                    np.full((j, _MAX_CUSTOM_STOPS), -1, np.int32),
                    cfg=self.cfg, hist_bucket=hb, sample=sample,
                    lenient=self.ecfg.lenient_audio_codes,
                    w8a8=self._w8a8,
                    banded=self.ecfg.banded_sampling,
                )
            programs += 1
        for b, k in sorted(decode_programs, key=lambda t: (t[0] or 0, t[1])):
            if self._codec is not None:
                snac_params, snac_cfg = self._codec
                (self.dstate, self._snac_state, *_rest) = _decode_audio_multi(
                    self.params, self.dstate, snac_params, self._snac_state,
                    gate, cfg=self.cfg, snac_cfg=snac_cfg,
                    attn_impl=self._attn_for(b), n_steps=n,
                    stop_ids=stop_ids, bucket=b,
                    lenient=self.ecfg.lenient_audio_codes, n_frames=k,
                    banded=self.ecfg.banded_sampling,
                )
            elif n > 1:
                self.dstate, _ = _decode_multi(
                    self.params, self.dstate, gate, cfg=self.cfg,
                    attn_impl=self._attn_for(b), n_steps=n,
                    stop_ids=stop_ids, bucket=b,
                )
            else:
                self.dstate, _ = _decode(
                    self.params, self.dstate, gate, cfg=self.cfg,
                    attn_impl=self._attn_for(b), bucket=b, stop_ids=stop_ids,
                )
            programs += 1
        if self._codec is not None and prompt_lens:
            from ..codec.stream_decode import (
                FRAME_TOKENS,
                WINDOW_FRAMES,
                reset_lanes,
                snac_stream_step,
            )

            snac_params, snac_cfg = self._codec
            B = self.ecfg.max_slots
            _, self._snac_state = snac_stream_step(
                snac_params,
                jnp.zeros((B, WINDOW_FRAMES * FRAME_TOKENS), jnp.int32),
                self._snac_state,
                jnp.zeros((B,), bool),
                cfg=snac_cfg,
            )
            # admission resets the codec lane eagerly; unwarmed, its first
            # run compiled mid-admission (measured ~10 s on the remote
            # compiler: the whole first request's TTFA)
            self._snac_state = reset_lanes(
                self._snac_state, jnp.asarray(np.zeros((B,), bool))
            )
            programs += 2
        # the admission path's EAGER ops compile on first use too: the
        # engine-key split (unseeded requests) and the seeded-key
        # constructor — a cold first admission measured a multi-second
        # stall on the tunnel's remote compiler without this (r5 trace)
        self._split_key()
        jax.random.key(0)
        # wipe every trace of the warmup from the slot table (presence
        # rows, lengths, rings); KV garbage at position 0 is overwritten
        # by the next prefill into a slot before anything can read it
        self.dstate = _release(
            self.dstate, jnp.ones((self.ecfg.max_slots,), bool)
        )
        # one tiny readback so warmup returns only after all programs ran
        jax.device_get(self.dstate["active"])
        return programs

    async def submit(
        self,
        prompt_ids: Sequence[int],
        sampling: Optional[SamplingParams] = None,
        *,
        audio: bool = False,
    ) -> Request:
        req = Request(list(prompt_ids), (sampling or SamplingParams()).clipped())
        # consumer drains wake the loop when backpressure had it parked
        req.on_drain = self._wake.set
        if audio:
            if not self.supports_audio:
                raise ValueError("engine built without a codec; audio mode off")
            from ..codec.stream_decode import StreamPlanner

            req.audio = True
            req.planner = StreamPlanner()
        await self._pending.put(req)
        self._wake.set()
        self._ensure_running()
        return req

    def cancel(self, req: Request) -> None:
        """Barge-in / client-drop path: immediate slot eviction."""
        if req.done:
            return
        req.state = RequestState.CANCELLED
        if req.slot is not None:
            self._evict(req.slot)
        req.token_queue.put_nowait(None)
        if req.audio:
            req.pcm_queue.put_nowait(None)
        self._wake.set()

    async def close(self) -> None:
        self._closed = True
        self._wake.set()
        if self._task is not None:
            await self._task
        self._readback_pool.shutdown(wait=False)

    # ------------------------------------------------------------ internals

    def _ensure_running(self) -> None:
        if self._task is None or self._task.done():
            self._task = asyncio.get_event_loop().create_task(self._run())

    def _split_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _guarded_admit(self, req: Request) -> None:
        """Admit one request; an admission failure fails THAT request
        (error state + closed streams) instead of crashing the engine
        task — a crash would stall every co-batched stream and leave the
        drained backlog's consumers hanging forever."""
        try:
            self._admit(req)
        except Exception:
            logger.exception(
                "admission failed for request %s; failing it and "
                "continuing to serve", req.request_id,
            )
            if req.slot is not None:
                self._evict(req.slot)
            req.state = RequestState.CANCELLED
            req.token_queue.put_nowait(None)
            if req.audio:
                req.pcm_queue.put_nowait(None)

    def _evict(self, slot: int) -> None:
        mask = np.zeros((self.ecfg.max_slots,), bool)
        mask[slot] = True
        self.dstate = _release(self.dstate, jnp.asarray(mask))
        self._by_slot.pop(slot, None)
        if slot not in self._free:
            self._free.append(slot)

    def _admit(self, req: Request) -> None:
        # the admission key seeds the slot's whole sampling chain: a
        # seeded request replays its exact trace on any engine, under any
        # co-batch (the adapter descriptor advertises supports_seed).
        # Seeds fold into uint32 range (negative / >=2**32 values would
        # overflow np.uint32 under NumPy 2); built FIRST so any failure
        # here leaves the slot table untouched (_fail_admission covers
        # the loop).
        if req.sampling.seed is not None:
            req_key = jax.random.key(int(req.sampling.seed) & 0xFFFFFFFF)
        else:
            req_key = self._split_key()
        slot = self._free.pop()
        req.slot = slot
        req.state = RequestState.PREFILLING
        self._by_slot[slot] = req
        if req.audio:
            # fresh codec lane: zero tails = the stream-head padding of a
            # full decode (stream_decode.init_stream_state).  Deferred and
            # BATCHED: one reset_lanes dispatch per admission wave instead
            # of one per request — 8 sequential resets measured ~500 ms of
            # a cold burst's TTFA (r5 trace); _advance_prefill flushes the
            # pending mask before any prefill dispatch, which always
            # precedes the slot's first frame.
            self._pending_lane_resets.add(slot)

        ids = req.prompt_ids
        # a prompt may fill the context up to a small safety margin;
        # anything beyond keeps its most recent tokens (reference n_ctx
        # semantics: llama_local.py:45-46 — but no silent //2 truncation).
        # The margin no longer scales with frames in flight: the DEVICE
        # deactivates a lane the step its budget runs out (_post_step), so
        # no dispatched frame can ever write past ctx_len + allowed.
        margin = 2
        max_prompt = self.ecfg.max_seq_len - margin - 2
        if len(ids) > max_prompt:
            logger.warning(
                "prompt of %d tokens exceeds context window; keeping the "
                "last %d", len(ids), max_prompt,
            )
            ids = ids[-max_prompt:]
        req.ctx_len = len(ids)
        # Total generation budget, enforced ON DEVICE (_post_step): the
        # lane deactivates the step it emits its last in-budget token, so
        # the fused codec ring / SNAC commit frontier can never advance
        # past the host planner on budget-terminated streams.  _deliver
        # uses the same number, keeping host and device in lockstep.
        req.allowed = min(
            req.sampling.max_tokens,
            self.ecfg.max_seq_len - margin - req.ctx_len,
        )
        custom = [
            s for s in dict.fromkeys(req.sampling.stop_token_ids)
            if s not in self.ecfg.default_stop_ids
        ]
        if len(custom) > _MAX_CUSTOM_STOPS:
            logger.warning(
                "request has %d custom stop ids; device-side early stop "
                "covers the first %d (the rest are enforced on the host "
                "with up to one dispatch of wasted tokens)",
                len(custom), _MAX_CUSTOM_STOPS,
            )
            custom = custom[:_MAX_CUSTOM_STOPS]
        stops = np.full((_MAX_CUSTOM_STOPS,), -1, np.int32)
        stops[: len(custom)] = custom
        samp = np.asarray(
            [
                req.sampling.temperature,
                req.sampling.top_p,
                req.sampling.repetition_penalty,
            ],
            np.float32,
        )
        # EVERY prompt becomes a chunked-prefill job — a short prompt is
        # simply a single offset-0 chunk whose history bucket is its own
        # prefill bucket, so one prefill family serves all lengths and
        # _advance_prefill batches same-shape admissions J-wide (a J=4
        # batched round measured ~25 ms/prompt vs ~50 ms for the former
        # dedicated single-shot program).  Deliberately no dispatch here:
        # a burst admits all its jobs first, so the group stays in
        # lockstep and the next round covers it in ONE program.
        # freeze the chunk plan at admission: fine (cadence-protecting)
        # rounds only when some stream is already decoding; a cold burst
        # keeps full-width rounds (see _plan_chunks)
        fine = any(
            r.state is RequestState.DECODING for r in self._by_slot.values()
        )
        self._prefill_jobs.append(
            {"req": req, "slot": slot, "ids": list(ids), "samp": samp,
             "offset": 0, "stops": stops, "key": req_key, "fine": fine}
        )

    def _hist_bucket(self, need: int) -> int:
        """Smallest static history bucket covering ``need`` positions."""
        for b in sorted(self.ecfg.context_buckets):
            if need <= b <= self.ecfg.max_seq_len:
                return b
        return self.ecfg.max_seq_len

    def _plan_chunks(self, total: int, fine: bool = True) -> List[tuple]:
        """Chunk schedule for a prompt: [(offset, chunk_len, hist, final)].

        Shared by warmup and serving so the warmed program set matches
        dispatch exactly.  With ``fine`` (the live-traffic plan), chunks
        halve once the attended history passes ``fine_chunk_hist``: a
        deep-history round's wall time is what a co-batched live stream
        stalls during admission interleave, and the per-round fixed cost
        is small next to it (admission hop-gap p95 during an 8k admission
        was frame + 103 ms full-width round; fine rounds cut the stall to
        ~frame + 60 ms, VERDICT r4 next #4).

        A COLD admission (no stream decoding when the job is admitted)
        has no cadence to protect, so it keeps full-width chunks all the
        way: half the deep-history rounds, and 8k-wide rounds run their
        w8a8 matmuls ~24% faster (M=8192 vs 4096, measured
        scripts/probe_w8a8_rate.py, DECISIONS r5-012).  The flag is
        frozen per job at admission — a job's offsets must walk ONE plan.
        """
        top = max(self.ecfg.prefill_buckets)
        out: List[tuple] = []
        off = 0
        while total - off > top:
            c = self.ecfg.prefill_chunk
            if fine and off >= self.ecfg.fine_chunk_hist:
                c = max(min(self.ecfg.prefill_buckets), c // 2)
            c = min(c, total - off - 1)  # final chunk is never empty
            out.append((off, c, self._hist_bucket(off + c), False))
            off += c
        rb = _bucket_for(total - off, self.ecfg.prefill_buckets)
        out.append((off, rb, self._hist_bucket(off + rb), True))
        return out

    def _job_next(self, job) -> tuple:
        """Descriptor of a job's next dispatch: (phase, chunk_len, hist)."""
        offset = job["offset"]
        for off, clen, hist, final in self._plan_chunks(
                len(job["ids"]), fine=job.get("fine", True)):
            if off == offset:
                return ("final" if final else "full", clen, hist)
        raise AssertionError(
            f"offset {offset} not on the chunk plan for {len(job['ids'])}"
        )

    def _advance_prefill(self) -> None:
        """Dispatch at most ONE chunk round of the chunked-prefill jobs.

        Called once per loop iteration (between decode frames): each chunk
        attends to all previously written history, so the result equals a
        single full-causal prefill -- but co-batched streams pay at most
        one chunk-round of cadence per frame while long prompts admit
        (vLLM-style chunked-prefill scheduling, engine_class.py:60-67).

        Jobs in LOCKSTEP -- the shape a simultaneous long-prompt burst
        produces, since admission takes the whole backlog at cold start --
        dispatch as ONE batched round (llama_prefill_chunk_batch): J
        chunks for the price of one dispatch and much better MXU
        utilisation than J sequential S=1024 programs.  Mixed-progress
        jobs fall back to the oldest job's single-chunk program.  On
        final chunks the first tokens are sampled and their readback
        deferred to the next frame (_flush_first_tokens).
        """
        if self._pending_lane_resets:
            from ..codec.stream_decode import reset_lanes

            mask = np.zeros((self.ecfg.max_slots,), bool)
            for s_ in self._pending_lane_resets:
                mask[s_] = True
            self._pending_lane_resets.clear()
            self._snac_state = reset_lanes(self._snac_state,
                                           jnp.asarray(mask))
        jobs = []
        for job in self._prefill_jobs:
            if (job["req"].done
                    or self._by_slot.get(job["slot"]) is not job["req"]):
                continue  # cancelled mid-prefill
            jobs.append(job)
        self._prefill_jobs = jobs
        if not jobs:
            return
        phase, clen, hist = desc = self._job_next(jobs[0])
        group = [j for j in jobs if self._job_next(j) == desc]
        # dispatch widths are quantized to POWERS OF TWO (and capped at
        # the warmed burst width): warmup enumerates exactly {1,2,4,...}
        # per program family, so any group size — a 6-wide burst, a burst
        # wider than warmup anticipated — lands on a warmed program
        # instead of compiling mid-serving; the remainder goes next round
        take = 1 << (len(group).bit_length() - 1)
        if self._max_batch_j:
            take = min(take, self._max_batch_j)
        group = group[:take]
        sample = phase == "final"

        if len(group) == 1:
            job = group[0]
            ids, offset = job["ids"], job["offset"]
            part = ids[offset : offset + clen]
            padded = np.zeros((clen,), np.int32)
            padded[: len(part)] = part
            self.dstate, first = _prefill_chunk(
                self.params,
                self.dstate,
                jnp.asarray(padded),
                jnp.asarray(len(part), jnp.int32),
                jnp.asarray(offset, jnp.int32),
                jnp.asarray(job["slot"], jnp.int32),
                jnp.asarray(job["samp"]),
                job["key"],
                np.asarray(job["req"].audio),
                np.asarray(job["req"].allowed, np.int32),
                job["stops"],
                cfg=self.cfg,
                hist_bucket=hist,
                sample=sample,
                lenient=self.ecfg.lenient_audio_codes,
                w8a8=self._w8a8,
                banded=self.ecfg.banded_sampling,
            )
            firsts = [first]
        else:
            J = len(group)
            toks = np.zeros((J, clen), np.int32)
            lens = np.zeros((J,), np.int32)
            offs = np.zeros((J,), np.int32)
            slots = np.zeros((J,), np.int32)
            samps = np.zeros((J, 3), np.float32)
            audio_f = np.zeros((J,), bool)
            allowed = np.zeros((J,), np.int32)
            stops = np.full((J, _MAX_CUSTOM_STOPS), -1, np.int32)
            for idx, job in enumerate(group):
                ids, offset = job["ids"], job["offset"]
                part = ids[offset : offset + clen]
                toks[idx, : len(part)] = part
                lens[idx] = len(part)
                offs[idx] = offset
                slots[idx] = job["slot"]
                samps[idx] = job["samp"]
                audio_f[idx] = job["req"].audio
                allowed[idx] = job["req"].allowed
                stops[idx] = job["stops"]
            self.dstate, firsts_arr = _prefill_chunk_batch(
                self.params,
                self.dstate,
                jnp.asarray(toks),
                jnp.asarray(lens),
                jnp.asarray(offs),
                jnp.asarray(slots),
                jnp.asarray(samps),
                jnp.stack([job["key"] for job in group]),
                np.asarray(audio_f),
                np.asarray(allowed),
                stops,
                cfg=self.cfg,
                hist_bucket=hist,
                sample=sample,
                lenient=self.ecfg.lenient_audio_codes,
                w8a8=self._w8a8,
                banded=self.ecfg.banded_sampling,
            )
            firsts = [firsts_arr[idx] for idx in range(J)]

        if sample:
            for job, first in zip(group, firsts):
                job["req"].state = RequestState.DECODING
                self._pending_first.append((job["slot"], job["req"], first))
            done = set(id(j) for j in group)
            self._prefill_jobs = [
                j for j in self._prefill_jobs if id(j) not in done
            ]
        else:
            for job in group:
                job["offset"] += clen

    def _deliver(self, req: Request, token: int) -> None:
        """Route one sampled token to the request, handling stop conditions."""
        stop_ids = req.stop_set
        if stop_ids is None:
            stop_ids = req.stop_set = (
                set(req.sampling.stop_token_ids)
                | set(self.ecfg.default_stop_ids)
            )
        req.generated += 1
        hit_stop = token in stop_ids
        # The device enforces the same budget (_post_step countdown seeded
        # with req.allowed at admission), so generation and the fused codec
        # ring halt in lockstep with this host-side check.
        out_of_budget = req.generated >= req.allowed
        if not hit_stop:
            req.token_queue.put_nowait(token)
        if hit_stop or out_of_budget:
            req.state = RequestState.FINISHED
            if req.slot is not None:
                self._evict(req.slot)
            req.token_queue.put_nowait(None)

    def _context_bucket(self, n_steps: int) -> Optional[int]:
        """Smallest configured bucket covering every live context through
        the end of the next ``n_steps``-token dispatch."""
        if not self._by_slot:
            return None
        # host-side counts lag the device by up to one dispatched-but-
        # unprocessed frame (the overlap pipeline) plus one token for a
        # pending async-admission first readback; add this dispatch's own
        # steps on top.  The device-side budget countdown guarantees no
        # lane ever writes past ctx_len + allowed <= max_seq_len - 2, so
        # the estimate only needs clamping, never an eviction check.
        need = (
            max(r.ctx_len + r.generated for r in self._by_slot.values())
            + n_steps
            + self.steps_per_sync * self.frames_per_dispatch
            + 2
        )
        need = min(need, self.ecfg.max_seq_len)
        for b in sorted(self.ecfg.context_buckets):
            if b >= need and b <= self.ecfg.max_seq_len:
                return b
        return None  # full allocated context

    def _backpressure_gate(self) -> Optional[jnp.ndarray]:
        """Per-dispatch slot mask from consumer-queue depth.

        Returns None when every live slot is saturated (skip the dispatch
        and wait for a drain), or a (B,) bool gate otherwise.
        """
        gate = np.ones((self.ecfg.max_slots,), bool)
        any_ready = False
        for slot, req in self._by_slot.items():
            depth = (
                req.pcm_queue.qsize() if req.audio else req.token_queue.qsize()
            )
            limit = (
                self.ecfg.max_queued_hops
                if req.audio
                else self.ecfg.max_queued_tokens
            )
            if depth >= limit:
                gate[slot] = False
            elif req.state is RequestState.DECODING:
                any_ready = True  # a still-prefilling slot can't take a frame
        if not any_ready:
            return None
        if gate.all():
            return jnp.ones((self.ecfg.max_slots,), jnp.bool_)
        return jnp.asarray(gate)

    def _attn_for(self, bucket: Optional[int]) -> str:
        """Resolve attn_impl="auto" per dispatch (see EngineConfig).

        Quantized caches at long context select the slot-wise flash
        kernel: A/B at 8x8192 (scripts + DECISIONS r5-007) reads
        pallas 16.6 vs dense 17.8 ms/step uniform and 11.1 vs 17.5
        MIXED — the kernel's HBM traffic follows live lengths, the
        dense path reads the full bucket for every slot.  CPU (tests)
        keeps dense: the interpret-mode kernel emulates DMA per block.
        """
        if self.attn_impl != "auto":
            return self.attn_impl
        if (
            self._on_tpu
            # the kernel reads whole per-slot cache rows; a TP/DP-sharded
            # cache would need a shard_map wrapper — mesh engines stay on
            # the dense path until that exists
            and self.mesh is None
            and jnp.dtype(self.ecfg.cache_dtype) == jnp.int8
            and (bucket or self.ecfg.max_seq_len)
            >= self.ecfg.pallas_min_bucket
        ):
            return "pallas"
        return "dense"

    def _dispatch_frame(self, gate):
        """Issue one decode dispatch; returns (payload, slot snapshot).

        ``payload`` is ``(toks, pcm, emit)``; audio batches run the FUSED
        frame program (decode + sample + on-device code ring + batched
        SNAC hop), so the frame's tokens AND its emitted PCM come back in
        one readback.  Token-only batches leave pcm/emit as None and skip
        the codec entirely.
        """
        n = self.steps_per_sync
        # device-side early stop: engine-wide default ids are a static arg
        # (one program, never recompiles); per-request custom stop ids ride
        # the per-slot custom_stops device array seeded at admission.
        stop_ids = tuple(sorted(self.ecfg.default_stop_ids))
        audio_reqs = [r for r in self._by_slot.values() if r.audio]
        if self._codec is not None and audio_reqs:
            # adaptive frame batching: pay the per-dispatch readback tax
            # once per k frames in steady state, but drop to one frame
            # whenever a stream still awaits its first hop (TTFA) or an
            # admission is in flight (prefill interleave cadence)
            k = self.frames_per_dispatch
            if (
                self._prefill_jobs
                or self._pending_first
                # an admission is actually imminent only when a slot is
                # free — with a full slot table a non-empty pending queue
                # must NOT pin k=1 (it would halve steady throughput
                # exactly when the engine is most loaded)
                or (self._free and not self._pending.empty())
                or any(r.planner.emitted == 0 for r in audio_reqs)
            ):
                k = 1
            bucket = self._context_bucket(n * k)
            snac_params, snac_cfg = self._codec
            (self.dstate, self._snac_state, toks, pcm, emit) = (
                _decode_audio_multi(
                    self.params,
                    self.dstate,
                    snac_params,
                    self._snac_state,
                    gate,
                    cfg=self.cfg,
                    snac_cfg=snac_cfg,
                    attn_impl=self._attn_for(bucket),
                    n_steps=n,
                    stop_ids=stop_ids,
                    bucket=bucket,
                    lenient=self.ecfg.lenient_audio_codes,
                    n_frames=k,
                    banded=self.ecfg.banded_sampling,
                )
            )
            return (toks, pcm, emit), dict(self._by_slot)
        bucket = self._context_bucket(n)
        if n > 1:
            self.dstate, toks = _decode_multi(
                self.params,
                self.dstate,
                gate,
                cfg=self.cfg,
                attn_impl=self._attn_for(bucket),
                n_steps=n,
                stop_ids=stop_ids,
                bucket=bucket,
            )
        else:
            self.dstate, toks = _decode(
                self.params,
                self.dstate,
                gate,
                cfg=self.cfg,
                attn_impl=self._attn_for(bucket),
                bucket=bucket,
                stop_ids=stop_ids,
            )
        return (toks, None, None), dict(self._by_slot)

    def _route_token(
        self,
        slot: int,
        req: Request,
        token: int,
        pending_hops: List[tuple],
        finished_audio: List[Request],
    ) -> bool:
        """Deliver one sampled token and track its audio framing.

        With a codec attached, steady/head hops are computed ON DEVICE by
        the fused frame program; the host planner runs as a mirror (same
        schedule, no dispatches) so end-of-stream flush hops — the only
        ones the device can't anticipate — still know the window and the
        emit frontier.  Returns True when the planner mirror produced a
        head/steady hop for this token (the caller uses it to gate the
        matching device-emitted PCM).
        """
        pushed = False
        self._deliver(req, token)
        if req.audio:
            from ..adapters.runtime import (
                audio_code_from_token_id,
                lenient_audio_code,
            )

            # stop/special ids fall outside the audio band -> None
            if self.ecfg.lenient_audio_codes:
                code = lenient_audio_code(token)
            else:
                code = audio_code_from_token_id(token, req.audio_pos)
            if code is not None:
                req.audio_pos += 1
                # mirror only: the device emitted the hop's PCM already
                pushed = bool(req.planner.push(code))
            if req.done:
                for h in req.planner.flush():
                    pending_hops.append((slot, req, h))
                finished_audio.append(req)
        return pushed

    def _flush_first_tokens(self) -> None:
        """Read back first tokens of prefills not yet routed (rare paths).

        The main loop folds pending firsts into each frame's single
        readback (_process_frame); this standalone reader covers the
        parked / idle / shutdown branches where no frame is in flight.
        """
        if not self._pending_first:
            return
        pending, self._pending_first = self._pending_first, []
        pending_hops: List[tuple] = []
        finished_audio: List[Request] = []
        # ONE readback for the whole burst: each host-blocking device_get
        # pays the tunnel's per-call tax (~26-70 ms measured) — a cold
        # 8-stream burst's firsts read one by one cost ~560 ms of pure
        # readback on top of the 120 ms prefill (r5 TTFA trace)
        firsts_host = jax.device_get([f[2] for f in pending])
        for (slot, req, _), val in zip(pending, firsts_host):
            if req.done or self._by_slot.get(slot) is not req:
                continue  # cancelled while the prefill was in flight
            self._route_token(
                slot, req, int(val), pending_hops, finished_audio,
            )
        if pending_hops:
            self._run_audio_hops(pending_hops)
        for req in finished_audio:
            self._pending_audio.append(("eos", req))

    def _process_frame(
        self,
        payload,
        slot_map: Dict[int, Request],
        firsts: Sequence[tuple] = (),
        host_out=None,
    ) -> None:
        """Routing for one completed frame dispatch (single readback).

        ``slot_map`` is the slot->request snapshot taken at dispatch time:
        a slot freed and re-admitted while this frame was in flight must
        not leak the old request's tail tokens into the new one.
        ``firsts`` are (slot, req, device scalar) first tokens sampled by
        prefills dispatched BEFORE this frame — routed first, since their
        codes entered the device ring first.  ``host_out`` is the already-
        fetched host copy of ``(toks, pcm, emit, first values)`` (the loop
        fetches it off-thread); when None it is read here.
        """
        toks, pcm, emit = payload
        if host_out is None:
            host_out = jax.device_get(
                (toks, pcm, emit, [f[2] for f in firsts])
            )
        toks_host, pcm_host, emit_host, firsts_host = host_out
        pending_hops: List[tuple] = []  # (slot, req, stream_decode.Hop)
        finished_audio: List[Request] = []

        for (slot, req, _), val in zip(firsts, firsts_host):
            if req.done or self._by_slot.get(slot) is not req:
                continue  # cancelled while the prefill was in flight
            self._route_token(slot, req, int(val), pending_hops,
                              finished_audio)

        toks_host = np.asarray(toks_host)
        if toks_host.ndim == 1:
            toks_host = toks_host[None, :]
        self.steps += toks_host.shape[0]

        def route_rows(rows, host_hops=None):
            for step_row in rows:
                for slot, req in slot_map.items():
                    if req.state is not RequestState.DECODING:
                        continue
                    if self._by_slot.get(slot) is not req:
                        continue  # slot re-assigned mid-flight
                    token = int(step_row[slot])
                    if token < 0:
                        continue
                    pushed = self._route_token(slot, req, token,
                                               pending_hops, finished_audio)
                    if pushed and host_hops is not None:
                        host_hops.add(slot)

        if pcm_host is None:
            route_rows(toks_host)
        else:
            # fused-frame PCM, one phase per codec frame: deliver a lane's
            # hop only when the HOST planner mirror also produced it from
            # the routed tokens — a lane whose request stopped (budget /
            # stop token) mid-dispatch keeps generating on device, and its
            # post-stop device hops must not reach the consumer (the flush
            # hops are built from the planner's shorter history).
            pcm_host = np.asarray(pcm_host)
            emit_host = np.asarray(emit_host)
            n_phases = pcm_host.shape[0]
            rows_per = toks_host.shape[0] // n_phases
            for ph in range(n_phases):
                host_hops: set = set()
                route_rows(
                    toks_host[ph * rows_per:(ph + 1) * rows_per], host_hops
                )
                for slot, req in slot_map.items():
                    if not (req.audio and emit_host[ph, slot]
                            and slot in host_hops):
                        continue
                    if req.state is RequestState.CANCELLED:
                        continue
                    req.pcm_queue.put_nowait(pcm_host[ph, slot].tobytes())

        if pending_hops:  # end-of-stream flush hops only
            self._run_audio_hops(pending_hops)
        for req in finished_audio:
            self._pending_audio.append(("eos", req))

    async def _settle(self, inflight) -> None:
        """Await a frame's (already issued) readback and route its results."""
        payload, slot_map, firsts, fut = inflight
        host_out = await fut
        self._process_frame(payload, slot_map, firsts, host_out)

    async def _drain(self, inflight):
        if inflight is not None:
            await self._settle(inflight)
        return None

    async def _run(self) -> None:
        # Overlap pipeline: each iteration dispatches frame N, issues its
        # readback from the dedicated worker pool, and only then processes
        # frame N-1's (already fetched) results while N runs on device.
        # On the axon/TPU tunnel a readback waits for everything queued at
        # its ISSUE time — so issuing the read BEFORE the next dispatch
        # hides both the ~26 ms per-readback tax and the host routing
        # behind device execution (scripts/probe_overlap.py: 68.5 ->
        # 44.3 ms/iter on a 44 ms program).  The r2 "dispatch-ahead"
        # pipeline issued reads AFTER the next dispatch and lost a full
        # frame per readback; issue order is what matters, not depth.
        loop = asyncio.get_running_loop()
        inflight = None  # (payload, slot snapshot, firsts, readback future)
        while not self._closed:
            # Admission: take the WHOLE backlog (up to free slots).  Every
            # prompt — short or long — becomes a chunked-prefill job, so a
            # simultaneous burst's jobs stay in LOCKSTEP and each round of
            # _advance_prefill covers the group in ONE J-wide batched
            # program (r4-006 for longs; r5 extends it to shorts — a cold
            # ctx-512 burst of 8 admits as ONE J=8 bucket-512 program
            # instead of the r4 paced 4/2/1/1 train whose median stream
            # waited half the serial prefill work, VERDICT r4 next #2).
            if self._free and not self._pending.empty():
                deferred = []
                while not self._pending.empty():
                    req = self._pending.get_nowait()
                    if req.state is RequestState.CANCELLED:
                        continue
                    if self._free:
                        self._guarded_admit(req)
                    else:
                        deferred.append(req)
                for req in deferred:
                    self._pending.put_nowait(req)

            if not self._by_slot:
                inflight = await self._drain(inflight)
                if self._by_slot or not self._pending.empty():
                    continue  # settling surfaced new work
                self._flush_first_tokens()  # all-cancelled edge: drop stale
                await self._flush_audio()
                self._wake.clear()
                try:
                    await asyncio.wait_for(self._wake.wait(), timeout=0.5)
                except asyncio.TimeoutError:
                    if self._closed:
                        break
                continue

            gate = self._backpressure_gate()
            if gate is None:
                inflight = await self._drain(inflight)
                if self._prefill_jobs:
                    # nothing decodable yet (prefill-only batch, or every
                    # decode consumer saturated): keep admissions moving,
                    # chunk by chunk, without useless empty frames.  Final
                    # chunks flip their lanes to DECODING, so the next
                    # iteration dispatches a frame and the sampled firsts
                    # ride ITS readback — blocking on a dedicated firsts
                    # readback here cost a cold burst ~100 ms of serial
                    # device+tax time before frame 1 could even dispatch
                    # (r5 TTFA trace).
                    self._advance_prefill()
                    await self._flush_audio()
                    await asyncio.sleep(0)
                    continue
                # every live consumer queue is saturated: drain pending
                # work, then park until a consumer get() wakes the loop
                self._flush_first_tokens()
                await self._flush_audio()
                self._wake.clear()
                if (
                    self._backpressure_gate() is not None
                    or not self._pending.empty()
                    or self._closed
                ):
                    continue
                try:
                    await asyncio.wait_for(self._wake.wait(), timeout=0.5)
                except asyncio.TimeoutError:
                    pass
                continue

            payload, slot_map = self._dispatch_frame(gate)
            # firsts sampled by prefills dispatched BEFORE this frame ride
            # its readback (their codes entered the device ring first); a
            # chunk dispatched below samples at the earliest into the NEXT
            # frame's readback
            firsts, self._pending_first = self._pending_first, []
            fut = loop.run_in_executor(
                self._readback_pool,
                jax.device_get,
                (payload[0], payload[1], payload[2],
                 [f[2] for f in firsts]),
            )
            # at most one prefill chunk rides behind this frame: long
            # admissions cost one chunk-time of cadence per frame, never
            # a back-to-back chunk train (VERDICT r2 next #4)
            self._advance_prefill()
            # process the PREVIOUS frame while this one runs on device
            if inflight is not None:
                await self._settle(inflight)
            inflight = (payload, slot_map, firsts, fut)
            # route flush-hop PCM whose readback has completed; entries
            # still in flight (queued behind the running frame) roll to a
            # later iteration instead of stalling the dispatch cadence
            await self._flush_audio(force=False)
        await self._drain(inflight)
        self._flush_first_tokens()
        await self._flush_audio()

    def _run_audio_hops(self, pending: List[tuple]) -> None:
        """Dispatch host-planned SNAC hops (end-of-stream flushes).

        Steady/head hops run INSIDE the fused frame program; what reaches
        here are the flush hops the device cannot anticipate (commit=False
        drains of the last window when a stream ends) plus the rare parked-
        branch paths.  All lanes' hops for one round run in ONE dispatch
        with per-lane commit masks; a lane needing several hops takes one
        extra round.
        """
        from ..codec.stream_decode import FRAME_TOKENS  # noqa: F401
        from ..codec.stream_decode import WINDOW_FRAMES, snac_stream_step

        snac_params, snac_cfg = self._codec
        B = self.ecfg.max_slots
        W = pending[0][2].window.shape[0]

        by_slot: Dict[int, List[tuple]] = {}
        for slot, req, h in pending:
            by_slot.setdefault(slot, []).append((req, h))
        rounds = max(len(v) for v in by_slot.values())
        for r in range(rounds):
            windows = np.zeros((B, W), np.int32)
            commit = np.zeros((B,), bool)
            emits: List[tuple] = []  # (slot, req, window_slot)
            for slot, lst in by_slot.items():
                if r >= len(lst):
                    continue
                req, h = lst[r]
                windows[slot] = h.window
                commit[slot] = h.commit
                for _frame_idx, ws in h.emits:
                    emits.append((slot, req, ws))
            pcm, self._snac_state = snac_stream_step(
                snac_params,
                jnp.asarray(windows),
                self._snac_state,
                jnp.asarray(commit),
                cfg=snac_cfg,
            )
            # issue the readback NOW (before any later frame dispatch can
            # queue ahead of it); _flush_audio routes the bytes once the
            # future completes, without ever blocking the frame cadence
            fut = asyncio.get_running_loop().run_in_executor(
                self._readback_pool, jax.device_get, pcm
            )
            self._pending_audio.append(("pcm", fut, emits))

    async def _flush_audio(self, force: bool = True) -> None:
        """Route dispatched flush-hop PCM, strictly in dispatch order.

        With ``force`` (drain / park / shutdown paths) every pending entry
        is awaited; otherwise entries whose readback is still in flight —
        they ride the device queue behind the currently running frame —
        are left for a later call so the dispatch cadence never stalls.
        A stream's ``eos`` sentinel always follows its final PCM entry.
        """
        hop_samples = self._codec[1].frame_samples if self._codec else 0
        while self._pending_audio:
            entry = self._pending_audio[0]
            if entry[0] == "eos":
                self._pending_audio.pop(0)
                entry[1].pcm_queue.put_nowait(None)
                continue
            _, fut, emits = entry
            if not force and not fut.done():
                return
            pcm_np = np.asarray(await fut)
            self._pending_audio.pop(0)
            for slot, req, ws in emits:
                if req.state is RequestState.CANCELLED:
                    continue
                req.pcm_queue.put_nowait(
                    pcm_np[slot, ws * hop_samples : (ws + 1) * hop_samples]
                    .tobytes()
                )
