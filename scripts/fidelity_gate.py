#!/usr/bin/env python3
"""One-command fidelity verdict against real weights (BASELINE gate).

The reference's fidelity anchor is the real ``snac_24khz`` torch weights
(speechpipe.py:41-61) and a real Orpheus checkpoint (engine_class.py:60-67).
This gate runs everything that can be checked with whatever weights are
present, and skips the rest with an explicit message:

1. **SNAC waveform parity** (needs ``ORPHEUS_SNAC_PATH`` .npz from
   scripts/convert_snac.py): fixed token trace -> JAX decode vs the torch
   oracle, allclose.
2. **Stream-decode gold**: the exact streaming decoder's mid-stream hops
   vs full prefix decode, with the same weights.
3. **Short synthesis** (needs ``ORPHEUS_CHECKPOINT_PATH``): one utterance
   through the live engine -> WAV on disk, TTFA and duration reported.

Exit codes: 0 = every runnable gate passed, 1 = a gate failed,
2 = nothing was runnable (no weights supplied).

    ORPHEUS_SNAC_PATH=snac24.npz ORPHEUS_CHECKPOINT_PATH=~/orpheus-3b \
        python scripts/fidelity_gate.py --wav /tmp/gate.wav
"""
from __future__ import annotations

import argparse
import asyncio
import os
import sys
import time
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def gate_snac_parity(npz_path: str) -> bool:
    """JAX decode vs torch oracle on the real weights, fixed trace."""
    from project_morpheus_tpu.codec import SNACConfig, snac_decode
    from project_morpheus_tpu.codec.frames import tokens_to_codes
    from project_morpheus_tpu.codec.torch_oracle import SnacDecoderOracle
    from project_morpheus_tpu.codec.weights import params_from_torch_state

    cfg = SNACConfig.snac_24khz()
    state = dict(np.load(npz_path))
    params = params_from_torch_state(state, cfg)
    oracle = SnacDecoderOracle(cfg)
    oracle.load_state(state)
    oracle.eval()

    rng = np.random.default_rng(42)
    toks = rng.integers(0, cfg.codebook_size, size=(1, 7 * 7), dtype=np.int32)
    codes = tokens_to_codes(toks)
    got = np.asarray(snac_decode(params, list(codes), cfg))
    want = oracle.decode(codes)
    err = float(np.max(np.abs(got - want)))
    ok = np.allclose(got, want, rtol=1e-4, atol=5e-5)
    print(f"[1/3] snac parity: max_abs_err={err:.2e} -> "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


def gate_stream_gold(npz_path: str) -> bool:
    """Exact streaming hops vs prefix decode on the real weights."""
    import jax.numpy as jnp

    from project_morpheus_tpu.codec import SNACConfig, snac_decode
    from project_morpheus_tpu.codec.frames import tokens_to_codes
    from project_morpheus_tpu.codec.stream_decode import (
        EMIT_SLOT,
        init_stream_state,
        snac_stream_step,
    )
    from project_morpheus_tpu.codec.weights import params_from_torch_state

    cfg = SNACConfig.snac_24khz()
    params = params_from_torch_state(dict(np.load(npz_path)), cfg)
    rng = np.random.default_rng(3)
    N = 6
    frames = rng.integers(0, cfg.codebook_size, size=(N, 7)).astype(np.int32)
    state = init_stream_state(cfg, 1)
    commit = jnp.ones((1,), bool)
    hop = cfg.frame_samples
    worst = 0
    for t in range(3, N):
        window = jnp.asarray(frames[t - 3 : t + 1].reshape(1, -1))
        pcm, state = snac_stream_step(params, window, state, commit, cfg=cfg)
        toks = jnp.asarray(frames[: t + 1].reshape(1, -1))
        audio = snac_decode(params, tokens_to_codes(toks), cfg, noise_rng=None)
        e = t - 2
        want = np.asarray(
            (audio[0, e * hop : (e + 1) * hop] * 32767.0).astype(jnp.int16)
        )
        got = np.asarray(pcm[0, EMIT_SLOT * hop : (EMIT_SLOT + 1) * hop])
        worst = max(
            worst,
            int(np.max(np.abs(got.astype(np.int32) - want.astype(np.int32)))),
        )
    ok = worst <= 1
    print(f"[2/3] stream gold: worst int16 err={worst} LSB -> "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


def gate_synthesis(wav_path: str, text: str) -> bool:
    """One utterance through the live engine; writes a WAV."""
    from project_morpheus_tpu.adapters.runtime import SAMPLE_RATE, get_runtime
    from project_morpheus_tpu.model.sampling import SamplingParams
    from project_morpheus_tpu.model.tokenizer import (
        DEFAULT_VOICE,
        default_tokenizer,
        format_prompt_ids,
    )

    async def run():
        runtime = await get_runtime().ensure()
        ids = format_prompt_ids(text, DEFAULT_VOICE, default_tokenizer())
        t0 = time.perf_counter()
        req = await runtime.engine.submit(
            ids, SamplingParams(max_tokens=700), audio=True
        )
        pcm, ttfa = bytearray(), None
        async for chunk in req.pcm_chunks():
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            pcm.extend(chunk)
        return bytes(pcm), ttfa

    pcm, ttfa = asyncio.run(run())
    with wave.open(wav_path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(SAMPLE_RATE)
        wf.writeframes(pcm)
    dur = len(pcm) / 2 / SAMPLE_RATE
    ok = dur > 0.2
    print(f"[3/3] synthesis: {dur:.2f}s audio, "
          f"ttfa={ttfa * 1000:.0f}ms -> {wav_path} "
          f"{'PASS' if ok else 'FAIL (no audio)'}"
          if ttfa is not None else
          f"[3/3] synthesis: no audio produced -> FAIL")
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--wav", default="fidelity_gate.wav")
    ap.add_argument("--text", default="The quick brown fox jumps over the "
                                      "lazy dog.")
    ap.add_argument(
        "--platform", default="cpu",
        help="jax platform (default cpu: the SNAC gates are small and must "
        "not contend with serving on the single tunnel chip; pass 'tpu' "
        "for the checkpoint-synthesis gate on hardware). The env var "
        "JAX_PLATFORMS alone is NOT enough — the axon site plugin "
        "overrides it, so the config is set explicitly here.",
    )
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    ran, failed = 0, 0
    snac_path = os.environ.get("ORPHEUS_SNAC_PATH")
    if snac_path and Path(snac_path).exists():
        ran += 1
        if not gate_snac_parity(snac_path):
            failed += 1
        if not gate_stream_gold(snac_path):
            failed += 1
    else:
        print("[1/3][2/3] SKIP: ORPHEUS_SNAC_PATH not set or missing — run "
              "scripts/convert_snac.py on the snac_24khz checkpoint first")

    ckpt = os.environ.get("ORPHEUS_CHECKPOINT_PATH")
    if ckpt and Path(os.path.expanduser(ckpt)).exists():
        ran += 1
        os.environ.setdefault("ORPHEUS_MODEL_SIZE", "3b")
        if not gate_synthesis(args.wav, args.text):
            failed += 1
    else:
        print("[3/3] SKIP: ORPHEUS_CHECKPOINT_PATH not set or missing — an "
              "HF Orpheus release dir or scripts/convert_checkpoint.py "
              "output works")

    if failed:
        print(f"fidelity gate: {failed} FAILURES")
        return 1
    if ran == 0:
        print("fidelity gate: nothing runnable (no weights supplied)")
        return 2
    print("fidelity gate: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
