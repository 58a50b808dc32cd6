#!/usr/bin/env python3
"""Isolate the fused frame program's device time vs the tunnel readback tax.

Measures, on the real chip (exclusive):
  A. dispatch fused frame -> device_get((toks, pcm, emit)) each iteration
     (what one serving-loop iteration pays)
  B. N fused frames chained, ONE readback at the end (device throughput)
  C. device_get of 1 small leaf vs the 3-leaf tuple right after a dispatch
     (is the tax per-call or per-leaf?)
  D. B with the plain token frame (_decode_multi) for the SNAC increment
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
    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.engine.engine import (
        _decode_audio_multi,
        _decode_multi,
    )
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.quant import quantize_params_int8

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
    p, ds, ss = eng.params, eng.dstate, eng._snac_state
    ds["active"] = jnp.ones((B,), jnp.bool_)
    ds["lengths"] = jnp.full((B,), bucket - 72, jnp.int32)
    ds["last_tokens"] = jnp.full((B,), AUDIO_LO + 5, jnp.int32)
    ds["temp"] = jnp.full((B,), 0.6, jnp.float32)
    ds["top_p"] = jnp.full((B,), 0.9, jnp.float32)
    ds["rep_pen"] = jnp.full((B,), 1.1, jnp.float32)
    key = jax.random.key(1)
    out = {}

    def fused(ds, ss):
        return _decode_audio_multi(
            p, ds, snac_params, ss, key, cfg=cfg, snac_cfg=snac_cfg,
            attn_impl="dense", n_steps=7, stop_ids=(128258, 128009),
            bucket=bucket, lenient=True)

    # warm/compile
    ds, ss, toks, pcm, emit = fused(ds, ss)
    jax.device_get((toks, pcm, emit))

    # A: dispatch + full readback per iteration
    t0 = time.perf_counter()
    for _ in range(iters):
        ds, ss, toks, pcm, emit = fused(ds, ss)
        jax.device_get((toks, pcm, emit))
    out["A_dispatch_plus_readback_ms"] = round(
        (time.perf_counter() - t0) / iters * 1000, 2)

    # B: chained frames, one readback
    t0 = time.perf_counter()
    for _ in range(iters):
        ds, ss, toks, pcm, emit = fused(ds, ss)
    jax.device_get((toks, pcm, emit))
    out["B_chained_per_frame_ms"] = round(
        (time.perf_counter() - t0) / iters * 1000, 2)

    # C: tax shape — single small leaf vs 3-leaf tuple, right after dispatch
    one, tup = [], []
    for _ in range(max(4, iters // 3)):
        ds, ss, toks, pcm, emit = fused(ds, ss)
        t0 = time.perf_counter()
        jax.device_get(emit)
        one.append((time.perf_counter() - t0) * 1000)
        ds, ss, toks, pcm, emit = fused(ds, ss)
        t0 = time.perf_counter()
        jax.device_get((toks, pcm, emit))
        tup.append((time.perf_counter() - t0) * 1000)
    out["C_readback_1leaf_ms"] = round(sorted(one)[len(one) // 2], 2)
    out["C_readback_3leaf_ms"] = round(sorted(tup)[len(tup) // 2], 2)

    # D: plain token frame chained (SNAC increment = B - D)
    ds, toks = _decode_multi(p, ds, key, cfg=cfg, attn_impl="dense",
                             n_steps=7, stop_ids=(128258, 128009),
                             bucket=bucket)
    jax.device_get(toks)
    t0 = time.perf_counter()
    for _ in range(iters):
        ds, toks = _decode_multi(p, ds, key, cfg=cfg, attn_impl="dense",
                                 n_steps=7, stop_ids=(128258, 128009),
                                 bucket=bucket)
    jax.device_get(toks)
    out["D_token_frame_chained_ms"] = round(
        (time.perf_counter() - t0) / iters * 1000, 2)

    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
