#!/usr/bin/env python3
"""Isolated device timings of every program in one serving-loop iteration.

The loop-phase profile (profile_serving.py) shows iterations blocked in
readbacks — this script times each device program alone (warm, chained on
its own carry, blocked properly) so the device budget of one frame
iteration is explicit:

  frame      = _decode_multi (7 decode steps + sampling, one dispatch)
  sample     = sampling alone (7x, isolated) to split decode vs sampling
  snac_hop   = snac_stream_step, all 8 lanes committing one 4-frame hop
  readback   = device_get of a small ready array (tunnel round-trip)
  readback_q = same, issued while a frame is queued (does the tunnel
               serialise readbacks behind queued programs?)

Run exclusively on the chip: ``python scripts/profile_programs.py``.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

AUDIO_LO = 128_266
AUDIO_HI = AUDIO_LO + 7 * 4096


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project_morpheus_tpu.codec import SNACConfig, init_snac_params
    from project_morpheus_tpu.codec.stream_decode import (
        init_stream_state,
        snac_stream_step,
    )
    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.engine.engine import _decode_multi
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.quant import quantize_params_int8
    from project_morpheus_tpu.model.sampling import SamplingParams, sample_logits

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg, dtype = LlamaConfig.orpheus_3b(), jnp.bfloat16
        snac_cfg = SNACConfig.snac_24khz()
        B, max_seq, bucket, iters = 8, 4096, 512, 20
    else:
        cfg, dtype = LlamaConfig.tiny(), jnp.float32
        snac_cfg = SNACConfig.tiny()
        B, max_seq, bucket, iters = 4, 256, 128, 3

    params = init_llama_params(cfg, jax.random.key(0), dtype=dtype)
    params["embed"] = params["embed"].at[AUDIO_LO:AUDIO_HI].multiply(10.0)
    if on_tpu:
        params = quantize_params_int8(params)
    snac_params = init_snac_params(snac_cfg, seed=0)

    eng = OrpheusEngine(
        params, cfg,
        EngineConfig(max_slots=B, max_seq_len=max_seq,
                     lenient_audio_codes=True),
        codec=(snac_params, snac_cfg),
    )
    p, ds = eng.params, eng.dstate
    ds["active"] = jnp.ones((B,), jnp.bool_)
    ds["lengths"] = jnp.full((B,), bucket - 64, jnp.int32)
    ds["last_tokens"] = jnp.full((B,), AUDIO_LO + 5, jnp.int32)
    ds["temp"] = jnp.full((B,), 0.6, jnp.float32)
    ds["top_p"] = jnp.full((B,), 0.9, jnp.float32)
    ds["rep_pen"] = jnp.full((B,), 1.1, jnp.float32)
    key = jax.random.key(1)
    out = {}

    # --- frame program (7 decode steps + sampling in one dispatch)
    def frame(ds):
        return _decode_multi(p, ds, key, cfg=cfg, attn_impl="dense",
                             n_steps=7, stop_ids=(128258, 128009),
                             bucket=bucket)

    ds, toks = frame(ds)
    toks.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        ds, toks = frame(ds)
    toks.block_until_ready()
    out["frame_ms"] = round((time.perf_counter() - t0) / iters * 1000, 2)

    # --- sampling alone (7 sequential calls on a fixed logits tensor)
    logits = jnp.zeros((B, cfg.padded_vocab), jnp.float32)
    presence = ds["presence"]

    samp = jax.jit(lambda lg, k, pr: sample_logits(
        lg, k, temperature=ds["temp"], top_p=ds["top_p"],
        repetition_penalty=ds["rep_pen"], presence=pr,
        vocab_size=cfg.vocab_size))
    r = samp(logits, key, presence)
    r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters * 7):
        r = samp(logits, key, presence)
    r.block_until_ready()
    out["sample_ms_per_step"] = round(
        (time.perf_counter() - t0) / (iters * 7) * 1000, 3)

    # --- SNAC hop (all lanes commit)
    sstate = init_stream_state(snac_cfg, B)
    W = 4 * 7
    windows = jnp.full((B, W), 100, jnp.int32)
    commit = jnp.ones((B,), bool)
    pcm, sstate = snac_stream_step(snac_params, windows, sstate, commit,
                                   cfg=snac_cfg)
    pcm.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        pcm, sstate = snac_stream_step(snac_params, windows, sstate, commit,
                                       cfg=snac_cfg)
    pcm.block_until_ready()
    out["snac_hop_ms"] = round((time.perf_counter() - t0) / iters * 1000, 2)

    # --- readback latency: ready small array, idle queue
    small = jnp.arange(56, dtype=jnp.int32)
    small.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jax.device_get(small))
    out["readback_idle_ms"] = round(
        (time.perf_counter() - t0) / iters * 1000, 2)

    # --- readback of a READY array while a frame is QUEUED
    waits = []
    for _ in range(max(3, iters // 4)):
        small2 = jnp.arange(56, dtype=jnp.int32) + 1
        small2.block_until_ready()
        ds, toks = frame(ds)  # queued, not finished
        t0 = time.perf_counter()
        np.asarray(jax.device_get(small2))
        waits.append((time.perf_counter() - t0) * 1000)
        toks.block_until_ready()
    out["readback_behind_queued_frame_ms"] = round(
        sorted(waits)[len(waits) // 2], 2)

    # --- host->device transfer latency (windows-sized array)
    t0 = time.perf_counter()
    for _ in range(iters):
        jnp.asarray(np.zeros((B, W), np.int32)).block_until_ready()
    out["h2d_small_ms"] = round((time.perf_counter() - t0) / iters * 1000, 2)

    # --- dispatch-only cost (host returns before completion)
    t0 = time.perf_counter()
    ds, toks = frame(ds)
    out["dispatch_host_ms"] = round((time.perf_counter() - t0) * 1000, 2)
    toks.block_until_ready()

    out["audio_ms_per_frame_iter"] = round(B * 2048 / 24_000 * 1000, 1)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
