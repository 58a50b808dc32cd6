#!/usr/bin/env python3
"""Benchmark: streamed-synthesis realtime factor on one TPU chip.

Measures the serving compute path end to end at the step level:

- the jitted continuous-batching decode step (Orpheus-3B-architecture,
  bf16, batch 8, 2048-token KV cache) including per-slot sampling
  (temperature/top-p/repetition-penalty over the 156k vocab), and
- the SNAC 24 kHz hop decode (7-frame window -> 2048-sample hop),

and derives audio-seconds-per-wall-second per chip (realtime factor).
Each generated token yields 85.3/7 ms of audio (BASELINE.md contract).

Prints ONE JSON line:
    {"metric": "audio_s_per_s_per_chip_batch8", "value": X,
     "unit": "x_realtime", "vs_baseline": X, ...extras}

``vs_baseline`` is the ratio against the reference's implied 1x-realtime
streaming per stream (~82 tok/s, BASELINE.md); the north-star target is
>= 10x at batch 8.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

AUDIO_S_PER_TOKEN = 0.085333 / 7  # 2048 samples @ 24 kHz per 7-token frame


def _time_fn(fn, *args, warmup=2, iters=20, **kw):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    times = []
    for _ in range(iters):
        t1 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t1)
    return statistics.median(times), out


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    platform = jax.default_backend()
    on_tpu = platform == "tpu"

    from project_morpheus_tpu.codec import SNACConfig, init_snac_params
    from project_morpheus_tpu.codec.streaming import _decode_window_slice
    from project_morpheus_tpu.engine.engine import _decode, _prefill
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params

    if on_tpu:
        cfg = LlamaConfig.orpheus_3b()
        dtype = jnp.bfloat16
        slots, max_seq, ctx = 8, 2048, 512
        snac_cfg = SNACConfig.snac_24khz()
        iters = 30
    else:  # CI/CPU smoke fallback — numbers are not the headline
        cfg = LlamaConfig.tiny_vocab()
        dtype = jnp.float32
        slots, max_seq, ctx = 8, 256, 64
        snac_cfg = SNACConfig.tiny()
        iters = 5

    key = jax.random.key(0)
    params = init_llama_params(cfg, key, dtype=dtype)
    jax.block_until_ready(params)

    from project_morpheus_tpu.model.llama import init_kv_cache

    B = slots
    dstate = {
        "cache": init_kv_cache(cfg, B, max_seq, jnp.bfloat16 if on_tpu else jnp.float32),
        "lengths": jnp.full((B,), ctx, jnp.int32),
        "active": jnp.ones((B,), jnp.bool_),
        "last_tokens": jnp.full((B,), 128266, jnp.int32),
        "presence": jnp.zeros((B, cfg.padded_vocab), jnp.bool_),
        "temp": jnp.full((B,), 0.6, jnp.float32),
        "top_p": jnp.full((B,), 0.9, jnp.float32),
        "rep_pen": jnp.full((B,), 1.1, jnp.float32),
    }

    # --- decode step (batch 8) ---
    def step(dstate, key):
        return _decode(params, dstate, key, cfg=cfg)

    # donation invalidates dstate; re-feed the returned state
    compiled = jax.jit(lambda d, k: _decode(params, d, k, cfg=cfg))
    k = jax.random.key(1)
    d = dstate
    for _ in range(3):
        d, toks = _decode(params, d, k, cfg=cfg)
    jax.block_until_ready(toks)
    times = []
    for i in range(iters):
        t1 = time.perf_counter()
        d, toks = _decode(params, d, k, cfg=cfg)
        jax.block_until_ready(toks)
        times.append(time.perf_counter() - t1)
    step_time = statistics.median(times)

    # --- SNAC hop decode (one 49-token window -> 2048 samples) ---
    snac_params = init_snac_params(snac_cfg, seed=0)
    window = jnp.zeros((49,), jnp.int32)
    hop_time, _ = _time_fn(
        lambda: _decode_window_slice(
            snac_params, window, cfg=snac_cfg, n_frames=7,
            emit_lo=4 * snac_cfg.frame_samples, emit_hi=5 * snac_cfg.frame_samples,
        ),
        warmup=2,
        iters=iters,
    )

    # per decode step each of B slots advances 1 token; B/7 hops per step
    hops_per_step = B / 7.0
    total_per_step = step_time + hops_per_step * hop_time
    rtf_batch = B * AUDIO_S_PER_TOKEN / total_per_step
    tokens_per_s = B / total_per_step

    # --- TTFA estimate: prefill(64-token prompt) + 7 steps + first hop ---
    prompt = jnp.zeros((1, 64), jnp.int32)
    t0 = time.perf_counter()
    d2, first = _prefill(
        params, d, prompt, jnp.asarray(48, jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray([0.6, 0.9, 1.1], jnp.float32), jax.random.key(2), cfg=cfg,
    )
    jax.block_until_ready(first)
    prefill_time = time.perf_counter() - t0  # includes compile on first call
    t0 = time.perf_counter()
    d2, first = _prefill(
        params, d2, prompt, jnp.asarray(48, jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray([0.6, 0.9, 1.1], jnp.float32), jax.random.key(3), cfg=cfg,
    )
    jax.block_until_ready(first)
    prefill_time = time.perf_counter() - t0
    ttfa_ms = (prefill_time + 7 * step_time + hop_time) * 1000.0

    result = {
        "metric": "audio_s_per_s_per_chip_batch8",
        "value": round(rtf_batch, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf_batch, 3),  # baseline = 1x realtime stream
        "platform": platform,
        "model": "orpheus_3b_bf16" if on_tpu else "tiny_cpu_smoke",
        "decode_step_ms": round(step_time * 1000, 3),
        "snac_hop_ms": round(hop_time * 1000, 3),
        "tokens_per_s_batch8": round(tokens_per_s, 1),
        "est_ttfa_ms": round(ttfa_ms, 1),
        "slots": B,
        "context": ctx,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
