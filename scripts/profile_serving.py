#!/usr/bin/env python3
"""Per-phase timing of the live serving loop (where does a frame go?).

Wraps the engine's loop phases (`_dispatch_frame`, `_advance_prefill`,
`_run_audio_hops`, `_flush_first_tokens`, `_process_frame`, `_settle`)
with wall timers, drives 8 concurrent audio streams exactly like bench.py,
and prints the per-iteration breakdown.  Everything outside the phases is
"loop other" (asyncio scheduling, admission bookkeeping, consumer wakeups).
`_settle` is the await of the previous frame's overlapped readback — large
values there mean the loop is device-bound, not host-bound.

Run exclusively on the chip:
``python scripts/profile_serving.py [ctx] [frames_per_dispatch]``.
"""
from __future__ import annotations

import asyncio
import collections
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

    from project_morpheus_tpu.codec import SNACConfig, init_snac_params
    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.quant import quantize_params_int8
    from project_morpheus_tpu.model.sampling import SamplingParams

    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    fpd = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg, dtype = LlamaConfig.orpheus_3b(), jnp.bfloat16
        snac_cfg = SNACConfig.snac_24khz()
        max_seq, max_tokens, n_streams = 4096, 280, 8
    else:
        cfg, dtype = LlamaConfig.tiny(), jnp.float32
        snac_cfg = SNACConfig.tiny()
        max_seq, max_tokens, n_streams, ctx = 256, 28, 4, 48

    params = init_llama_params(cfg, jax.random.key(0), dtype=dtype)
    params["embed"] = params["embed"].at[AUDIO_LO:AUDIO_HI].multiply(10.0)
    if on_tpu:
        params = quantize_params_int8(params)
    snac_params = init_snac_params(snac_cfg, seed=0)

    engine = OrpheusEngine(
        params, cfg,
        EngineConfig(max_slots=n_streams, max_seq_len=max_seq,
                     lenient_audio_codes=True, frames_per_dispatch=fpd),
        codec=(snac_params, snac_cfg),
    )

    stats = collections.defaultdict(float)
    counts = collections.defaultdict(int)

    def wrap(name):
        orig = getattr(engine, name)
        if asyncio.iscoroutinefunction(orig):
            async def timed(*a, _orig=orig, _name=name, **kw):
                t0 = time.perf_counter()
                out = await _orig(*a, **kw)
                stats[_name] += time.perf_counter() - t0
                counts[_name] += 1
                return out
        else:
            def timed(*a, _orig=orig, _name=name, **kw):
                t0 = time.perf_counter()
                out = _orig(*a, **kw)
                stats[_name] += time.perf_counter() - t0
                counts[_name] += 1
                return out

        setattr(engine, name, timed)

    for name in ("_dispatch_frame", "_advance_prefill", "_run_audio_hops",
                 "_flush_audio", "_flush_first_tokens", "_process_frame",
                 "_settle", "_admit"):
        wrap(name)

    sp = SamplingParams(temperature=0.6, top_p=0.9, repetition_penalty=1.1,
                        max_tokens=max_tokens, stop_token_ids=())

    async def drive(ids):
        req = await engine.submit(ids, sp, audio=True)
        nbytes = 0
        async for pcm in req.pcm_chunks():
            nbytes += len(pcm)
        return nbytes

    def prompt(seed):
        return [(seed * 7919 + j * 31) % 100_000 + 10 for j in range(ctx)]

    async def run():
        # warmup (compiles)
        await asyncio.gather(*[drive(prompt(i)) for i in range(n_streams)])
        stats.clear()
        counts.clear()
        t0 = time.perf_counter()
        outs = await asyncio.gather(
            *[drive(prompt(100 + i)) for i in range(n_streams)]
        )
        wall = time.perf_counter() - t0
        await engine.close()
        return wall, sum(outs)

    wall, nbytes = asyncio.run(run())
    audio_s = nbytes / 2 / 24_000
    iters = counts.get("_dispatch_frame", 1)
    phases = {
        k: {"total_ms": round(v * 1000, 1),
            "per_iter_ms": round(v * 1000 / iters, 2),
            "calls": counts[k]}
        for k, v in sorted(stats.items(), key=lambda kv: -kv[1])
    }
    accounted = sum(v for v in stats.values())
    print(json.dumps({
        "ctx": ctx,
        "frames_per_dispatch": fpd,
        "wall_s": round(wall, 3),
        "rtf": round(audio_s / wall, 3),
        "frame_iters": iters,
        "ms_per_iter": round(wall * 1000 / iters, 2),
        "phases": phases,
        "loop_other_ms_per_iter": round(
            (wall - accounted) * 1000 / iters, 2),
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
