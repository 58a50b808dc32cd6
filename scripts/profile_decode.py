#!/usr/bin/env python3
"""Decode-step floor profiler: bytes moved vs time per phase.

Answers VERDICT r2 "next" #3 with numbers: where does the per-token decode
step's time go, what is the HBM-roofline floor for each phase, and does the
int8-KV program carry a fixed allocation-proportional overhead (the r3-004
suspicion: a whole-cache copy from failed buffer aliasing)?

For each (cache_dtype, max_seq, bucket) cell it measures the engine's real
``_decode`` / ``_decode_multi`` programs (donated dstate, exactly the
serving dispatch) and reports ms/token.  It also compiles the step and
counts bytes in ``copy``/``copy-start`` HLO ops so a failed donation is
visible directly, not inferred.

Phases of one step (orpheus_3b, B=8):
  weights  int8 fused weights ~3.3 GB       -> read once per token
  KV       2 * L*B*KV*bucket*HD * dtype     -> read once per token
  writes   negligible (one position)
  sampling top_p over padded vocab (156k)   -> (B, Vp) fp32 logits ~5 MB

Run on the chip: ``python scripts/profile_decode.py``.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax_block(out)
    return (time.perf_counter() - t0) / iters * 1000.0, out


def jax_block(tree):
    import jax

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def copy_bytes_in_hlo(compiled) -> int:
    """Total bytes output by copy/copy-start ops in the compiled module."""
    import re

    total = 0
    txt = compiled.as_text()
    for m in re.finditer(
        r"(\S+?)\[([0-9,]*)\][^=]*= (?:copy|copy-start)\(", txt
    ):
        dt, dims = m.group(1), m.group(2)
        size = {"bf16": 2, "f32": 4, "s8": 1, "s32": 4, "pred": 1,
                "u32": 4, "s32": 4}.get(dt.split("{")[0], 2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * size
    return total


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.engine.engine import _decode, _decode_multi
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.quant import quantize_params_int8

    on_tpu = jax.default_backend() == "tpu"
    cfg = LlamaConfig.orpheus_3b() if on_tpu else LlamaConfig.tiny()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B = 8

    params = init_llama_params(cfg, jax.random.key(0), dtype=dtype)
    if on_tpu:
        params = quantize_params_int8(params)

    # warm state builder: an engine gives us the fused params + dstate layout
    def build(cache_dtype, max_seq):
        eng = OrpheusEngine(
            params, cfg,
            EngineConfig(max_slots=B, max_seq_len=max_seq,
                         cache_dtype=cache_dtype),
        )
        ds = eng.dstate
        ds["active"] = jnp.ones((B,), jnp.bool_)
        ds["lengths"] = jnp.full((B,), 500, jnp.int32)
        ds["last_tokens"] = jnp.full((B,), 12345, jnp.int32)
        ds["temp"] = jnp.full((B,), 0.6, jnp.float32)
        ds["top_p"] = jnp.full((B,), 0.9, jnp.float32)
        ds["rep_pen"] = jnp.full((B,), 1.1, jnp.float32)
        return eng.params, ds

    cells = (
        [
            # (cache_dtype, max_seq, bucket): fixed-overhead isolation —
            # same bucket, different allocation
            ("bfloat16", 2048, 512),
            ("bfloat16", 2048, 2048),
            ("bfloat16", 4096, 2048),
            ("int8", 2048, 512),
            ("int8", 2048, 2048),
            ("int8", 4096, 2048),
            ("int8", 8192, 2048),
            ("int8", 8192, 8192),
        ]
        if on_tpu
        else [("bfloat16", 256, 128), ("int8", 256, 128)]
    )

    key = jax.random.key(1)
    rows = []
    for cache_dtype, max_seq, bucket in cells:
        p, ds = build(cache_dtype, max_seq)
        lowered = _decode.lower(p, ds, key, cfg=cfg, attn_impl="dense",
                                bucket=bucket)
        compiled = lowered.compile()
        cb = copy_bytes_in_hlo(compiled)

        def step(ds):
            ds, toks = _decode(p, ds, key, cfg=cfg, attn_impl="dense",
                               bucket=bucket)
            return ds, toks

        # measured as the serving loop runs it: donated carry, chained
        ds, _ = step(ds)  # compile+warm
        jax_block(ds)
        iters = 20 if on_tpu else 3
        t0 = time.perf_counter()
        for _ in range(iters):
            ds, toks = step(ds)
        jax_block(toks)
        ms = (time.perf_counter() - t0) / iters * 1000.0

        # 7-token frame program (the real serving dispatch)
        ds7, toks7 = _decode_multi(p, ds, key, cfg=cfg, attn_impl="dense",
                                   n_steps=7, stop_ids=(128258,),
                                   bucket=bucket)
        jax_block(toks7)
        t0 = time.perf_counter()
        for _ in range(iters):
            ds7, toks7 = _decode_multi(p, ds7, key, cfg=cfg,
                                       attn_impl="dense", n_steps=7,
                                       stop_ids=(128258,), bucket=bucket)
        jax_block(toks7)
        ms7 = (time.perf_counter() - t0) / iters * 1000.0 / 7

        row = {
            "cache_dtype": cache_dtype,
            "max_seq_alloc": max_seq,
            "bucket": bucket,
            "single_step_ms": round(ms, 3),
            "frame_ms_per_token": round(ms7, 3),
            "hlo_copy_bytes_mb": round(cb / 1e6, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        del p, ds, ds7

    print(json.dumps({"rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
