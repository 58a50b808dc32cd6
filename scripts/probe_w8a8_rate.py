#!/usr/bin/env python3
"""Isolate why w8a8 chunk-prefill matmuls run at ~169 of 394 int8 TFLOP/s.

DECISIONS r5-010 attributes ~2.1 s of the 8x8k admission wall to the
w8a8 projections/MLP at 169 TFLOP/s (of the v5e 394 int8 peak; bf16
peak 197, measured bf16 186).  This probe times each candidate variant
at the exact chunk-round shapes (J=8 lanes x S=512 chunk = 4096 token
rows) against the fused layer weights so the attribution is explicit:

  dot_i8     pure int8 x int8 dot, activations pre-quantized (upper
             bound: is the int8 MXU mode even reached?)
  w8a8       the shipping matmul_w8a8 (f32 abs-max quant inline)
  w8a8_bf16q same, but the abs-max/round/clip chain runs in bf16
  dot_bf16   bf16 x bf16 dot (the 186 reference)
  wdeq       weight-only dequant-in-dot (the 120 reference)

Run exclusively on the chip: ``python scripts/probe_w8a8_rate.py``.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

M = int(__import__("os").environ.get("PROBE_M", 4096))  # 8 lanes x chunk
REPS = 30


def timed(mm, h, *wargs):
    """Device time per matmul: REPS iterations chained INSIDE one jit
    (r5-003: eager chaining over the tunnel mismeasures by ~100x; a
    scalar carry from each output into the next input serialises the
    dots without adding measurable work)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def step(_, carry):
        hc, acc = carry
        y = mm(hc, *wargs)
        s = jnp.sum(y.astype(jnp.float32)) * 1e-20
        return hc + s.astype(hc.dtype), acc + s

    @jax.jit
    def run(hc):
        return lax.fori_loop(0, REPS, step, (hc, jnp.float32(0)))[1]

    jax.block_until_ready(run(h))
    t0 = time.perf_counter()
    jax.block_until_ready(run(h))
    return (time.perf_counter() - t0) / REPS


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from project_morpheus_tpu.model.quant import (
        matmul_maybe_quant,
        matmul_w8a8,
        quantize_weight,
    )

    # fused-leaf shapes of one 3B layer: wqkv, wo, wgu, wd
    shapes = [(3072, 5120), (3072, 3072), (3072, 16384), (8192, 3072)]
    key = jax.random.PRNGKey(0)
    results = {}

    def quant_bf16(h, wq, wscale):
        hf = h  # stay in bf16
        hsc = (jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True),
                           1e-2) / 127.0)
        h8 = jnp.clip(jnp.round(hf / hsc), -127, 127).astype(jnp.int8)
        y32 = jax.lax.dot_general(
            h8, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (y32.astype(jnp.float32) * hsc.astype(jnp.float32)
                * wscale).astype(h.dtype)

    for K, N in shapes:
        kh, kw = jax.random.split(jax.random.fold_in(key, K * N))
        h = jax.random.normal(kh, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.bfloat16)
        wq = quantize_weight(w, axis=-2)
        h8 = jnp.clip(jnp.round(h.astype(jnp.float32) * 16), -127, 127
                      ).astype(jnp.int8)
        flops = 2.0 * M * K * N

        variants = {
            "dot_i8": lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32),
            "w8a8": matmul_w8a8,
            "w8a8_bf16q": quant_bf16,
            "dot_bf16": lambda a, b: a @ b,
            "wdeq": matmul_maybe_quant,
        }
        args = {
            "dot_i8": (h8, wq["q"]),
            "w8a8": (h, wq),
            "w8a8_bf16q": (h, wq["q"], wq["scale"]),
            "dot_bf16": (h, w),
            "wdeq": (h, wq),
        }
        row = {}
        for name, fn in variants.items():
            dt = timed(fn, *args[name])
            row[name] = round(flops / dt / 1e12, 1)
        results[f"{K}x{N}"] = row
        print(f"({M},{K})@({K},{N}) TFLOP/s:", row, flush=True)

    print(json.dumps({"M": M, "tflops": results}))
