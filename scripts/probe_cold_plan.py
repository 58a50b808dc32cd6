#!/usr/bin/env python3
"""A/B the cold-burst chunk plan (DECISIONS r5-012).

A cold admission (no live decoding streams) keeps full-width prefill
chunks; the live plan halves widths past ``fine_chunk_hist`` to protect
co-batched cadence.  This probe measures the cold 8-stream ctx-7424
burst TTFA under both plans on the attached chip:

  coarse  the shipping behaviour (fine=False jobs at cold admission)
  fine    the pre-r5-012 behaviour, forced by pinning _plan_chunks

Run exclusively on the chip: ``python scripts/probe_cold_plan.py``.
"""
from __future__ import annotations

import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

AUDIO_LO = 128_266
AUDIO_HI = AUDIO_LO + 7 * 4096
CTX, STREAMS, TOKENS = 7424, 8, 28


def main() -> int:
    import jax
    import jax.numpy as jnp

    from project_morpheus_tpu.codec import SNACConfig, init_snac_params
    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.quant import quantize_params_int8
    from project_morpheus_tpu.model.sampling import SamplingParams

    cfg = LlamaConfig.orpheus_3b()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params["embed"] = params["embed"].at[AUDIO_LO:AUDIO_HI].multiply(10.0)
    params = quantize_params_int8(params)
    snac = (init_snac_params(SNACConfig.snac_24khz(), seed=0),
            SNACConfig.snac_24khz())

    def prompt(seed):
        return [(seed * 7919 + j * 31) % 100_000 + 10 for j in range(CTX)]

    async def drive(engine, i):
        sp = SamplingParams(temperature=0.6, top_p=0.9,
                            repetition_penalty=1.1, max_tokens=TOKENS,
                            stop_token_ids=())
        t0 = time.perf_counter()
        req = await engine.submit(prompt(i), sp)
        first = None
        async for _pcm in req.pcm_chunks():
            if first is None:
                first = time.perf_counter() - t0
        return first

    async def burst(engine):
        firsts = await asyncio.gather(
            *[drive(engine, i) for i in range(STREAMS)])
        return sorted(1000.0 * f for f in firsts)

    for arm in ("coarse", "fine"):
        engine = OrpheusEngine(
            params, cfg,
            EngineConfig(max_slots=STREAMS, max_seq_len=8192,
                         cache_dtype="int8", lenient_audio_codes=True),
            codec=snac,
        )
        if arm == "fine":
            orig = engine._plan_chunks
            engine._plan_chunks = (
                lambda total, fine=True: orig(total, fine=True))
        async def arm_run(engine=engine, arm=arm):
            # warmup + all reps on ONE loop (the engine task binds to
            # the first loop that awaits it)
            t0 = time.perf_counter()
            engine.warmup(prompt_lens=[CTX], max_new_tokens=TOKENS,
                          burst=STREAMS)
            warm_s = time.perf_counter() - t0
            for rep in range(2):
                ttfas = await burst(engine)
                p50 = ttfas[len(ttfas) // 2]
                print(f"{arm} rep{rep}: ttfa_p50={p50:.0f} ms "
                      f"min={ttfas[0]:.0f} max={ttfas[-1]:.0f} "
                      f"(warmup {warm_s:.0f}s)", flush=True)
            await engine.close()

        asyncio.run(arm_run())
        del engine
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
