#!/usr/bin/env python3
"""Pin down the int8-KV decode step's fixed overhead vs bf16 (r3-004).

Two diagnostics per (cache dtype, bucket):
1. compiled.memory_analysis(): if donation/aliasing of the cache through
   the jitted step failed, a cache-sized temp allocation shows up here
   without running anything.
2. measured ms/step: 20 chained 7-step frame programs, timed by final
   readback (block_until_ready does not block on this transport).

Run exclusively on the chip.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project_morpheus_tpu.engine.engine import _decode_multi
    from project_morpheus_tpu.model import (
        LlamaConfig,
        init_kv_cache,
        init_llama_params,
    )
    from project_morpheus_tpu.model.quant import quantize_params_int8

    cfg = LlamaConfig.orpheus_3b()
    params = quantize_params_int8(
        init_llama_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    )
    B = 8

    def build_dstate(cache_dtype, S):
        Vp = cfg.padded_vocab
        return {
            "cache": init_kv_cache(cfg, B, S, jnp.dtype(cache_dtype)),
            "lengths": jnp.full((B,), 1900, jnp.int32),
            "active": jnp.ones((B,), jnp.bool_),
            "remaining": jnp.full((B,), 10_000, jnp.int32),
            "is_audio": jnp.zeros((B,), jnp.bool_),
            "custom_stops": jnp.full((B, 8), -1, jnp.int32),
            "rng": jax.random.split(jax.random.key(0), B),
            "last_tokens": jnp.full((B,), 42, jnp.int32),
            "presence": jnp.zeros((B, Vp), jnp.bool_),
            "temp": jnp.full((B,), 0.6, jnp.float32),
            "top_p": jnp.full((B,), 0.9, jnp.float32),
            "rep_pen": jnp.full((B,), 1.1, jnp.float32),
        }

    gate = jnp.ones((B,), jnp.bool_)
    # bf16 8x8192 does not fit (the int8 posture exists for that); compare
    # at equal allocation (4096) to isolate the dtype effect, and int8 at
    # 8192 to test allocation-proportionality of the overhead.
    for cache_dtype, S in (("bfloat16", 4096), ("int8", 4096),
                           ("int8", 8192)):
        for bucket in (2048,):
            dstate = build_dstate(cache_dtype, S)
            kw = dict(cfg=cfg, attn_impl="dense", n_steps=7,
                      stop_ids=(), bucket=bucket)
            lowered = _decode_multi.lower(params, dstate, gate, **kw)
            mem = lowered.compile().memory_analysis()
            print(f"--- {cache_dtype} S={S} bucket={bucket}")
            try:
                print(f"  temp_bytes={mem.temp_size_in_bytes/2**20:.1f} MiB "
                      f"output={mem.output_size_in_bytes/2**30:.2f} GiB "
                      f"args={mem.argument_size_in_bytes/2**30:.2f} GiB "
                      f"alias={mem.alias_size_in_bytes/2**30:.2f} GiB")
            except Exception as e:
                print("  memory_analysis fields unavailable:", e)

            # measured per-step: chain 20 frames through the jit cache
            out = _decode_multi(params, dstate, gate, **kw)
            dstate, toks = out
            np.asarray(toks)  # sync after compile
            t0 = time.perf_counter()
            n = 20
            for _ in range(n):
                dstate, toks = _decode_multi(params, dstate, gate, **kw)
            np.asarray(toks)
            dt = (time.perf_counter() - t0) / n
            print(f"  frame(7 steps): {dt*1e3:.1f} ms -> "
                  f"{dt*1e3/7:.2f} ms/step")
            del dstate


if __name__ == "__main__":
    main()
