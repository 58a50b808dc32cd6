#!/usr/bin/env python3
"""A/B frames_per_dispatch under the overlap loop: one ctx-512 batch-8 row
per k, reporting RTF / TTFA / hop-gap percentiles.  Run exclusively."""
import asyncio
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

AUDIO_LO = 128_266
AUDIO_HI = AUDIO_LO + 7 * 4096


def pct(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(q * (len(xs) - 1))))] if xs else None


def main():
    import jax
    import jax.numpy as jnp

    from project_morpheus_tpu.codec import SNACConfig, init_snac_params
    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.quant import quantize_params_int8
    from project_morpheus_tpu.model.sampling import SamplingParams

    cfg = LlamaConfig.orpheus_3b()
    snac_cfg = SNACConfig.snac_24khz()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params["embed"] = params["embed"].at[AUDIO_LO:AUDIO_HI].multiply(10.0)
    params = quantize_params_int8(params)
    snac_params = init_snac_params(snac_cfg, seed=0)

    ks = [int(x) for x in (sys.argv[1:] or ["1", "2", "4", "6"])]
    for k in ks:
        eng = OrpheusEngine(
            params, cfg,
            EngineConfig(max_slots=8, max_seq_len=4096,
                         lenient_audio_codes=True, frames_per_dispatch=k),
            codec=(snac_params, snac_cfg),
        )
        eng.warmup(prompt_lens=[512], max_new_tokens=560)

        sp = SamplingParams(temperature=0.6, top_p=0.9,
                            repetition_penalty=1.1, max_tokens=560,
                            stop_token_ids=())

        async def drive(i):
            t0 = time.perf_counter()
            req = await eng.submit(
                [(i * 7919 + j * 31) % 100_000 + 10 for j in range(512)],
                sp, audio=True)
            times, nb = [], 0
            async for pcm in req.pcm_chunks():
                times.append(time.perf_counter())
                nb += len(pcm)
            return t0, times, nb

        async def row():
            # tiny warm pass for host paths
            sp_w = SamplingParams(temperature=0.6, max_tokens=14,
                                  stop_token_ids=())
            req = await eng.submit([1] * 512, sp_w, audio=True)
            async for _ in req.pcm_chunks():
                pass
            t0 = time.perf_counter()
            outs = await asyncio.gather(*[drive(i) for i in range(8)])
            wall = time.perf_counter() - t0
            await eng.close()
            return wall, outs

        wall, outs = asyncio.run(row())
        audio_s = sum(o[2] for o in outs) / 2 / 24_000
        ttfas = [(o[1][0] - o[0]) * 1e3 for o in outs if o[1]]
        gaps = [(b - a) * 1e3 for o in outs for a, b in zip(o[1], o[1][1:])]
        print(json.dumps({
            "k": k, "rtf": round(audio_s / wall, 2),
            "ttfa_p50": round(pct(ttfas, 0.5), 1),
            "ttfa_p95": round(pct(ttfas, 0.95), 1),
            "gap_p50": round(pct(gaps, 0.5), 1),
            "gap_p95": round(pct(gaps, 0.95), 1),
        }))
        del eng


if __name__ == "__main__":
    main()
