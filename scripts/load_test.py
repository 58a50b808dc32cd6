#!/usr/bin/env python3
"""Async load-test client: N workers x M streaming requests with TTFB and
chunk-cadence logging.

Capability parity with the reference's Baseten fan-out client
(Orpheus-TTS/additional_inference_options/baseten_inference_example/
call_orpheus.py:30-60), pointed at the local /v1/audio/speech endpoint.
"""
from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import httpx  # noqa: E402

PROMPTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Streaming synthesis keeps playback ahead of generation.",
    "Barge-in interrupts the current utterance at a frame boundary.",
    "Adaptive chunk sizing balances latency and throughput.",
]


async def stream_one(client: httpx.AsyncClient, url: str, text: str, voice: str):
    t0 = time.perf_counter()
    ttfb = None
    chunks = 0
    total = 0
    async with client.stream(
        "POST", url, json={"input": text, "voice": voice}
    ) as resp:
        resp.raise_for_status()
        async for chunk in resp.aiter_bytes():
            if ttfb is None:
                ttfb = time.perf_counter() - t0
            chunks += 1
            total += len(chunk)
    return {
        "ttfb_s": ttfb or 0.0,
        "wall_s": time.perf_counter() - t0,
        "chunks": chunks,
        "pcm_bytes": max(0, total - 44),
    }


async def worker(wid: int, url: str, n: int, voice: str, results: list):
    async with httpx.AsyncClient(timeout=None) as client:
        for i in range(n):
            text = PROMPTS[(wid + i) % len(PROMPTS)]
            try:
                results.append(await stream_one(client, url, text, voice))
            except Exception as exc:  # noqa: BLE001
                results.append({"error": str(exc)})


async def main_async(args) -> dict:
    results: list = []
    url = f"{args.base_url.rstrip('/')}/v1/audio/speech"
    t0 = time.perf_counter()
    await asyncio.gather(
        *[worker(w, url, args.requests, args.voice, results) for w in range(args.workers)]
    )
    wall = time.perf_counter() - t0
    ok = [r for r in results if "error" not in r]
    errors = [r for r in results if "error" in r]
    ttfbs = sorted(r["ttfb_s"] for r in ok) or [0.0]
    audio_s = sum(r["pcm_bytes"] / 2 / 24000 for r in ok)
    return {
        "requests": len(results),
        "errors": len(errors),
        "wall_s": round(wall, 3),
        "ttfb_p50_ms": round(1000 * statistics.median(ttfbs), 1),
        "ttfb_p95_ms": round(1000 * ttfbs[int(0.95 * (len(ttfbs) - 1))], 1),
        "audio_seconds": round(audio_s, 2),
        "aggregate_rtf": round(audio_s / wall, 2) if wall else 0.0,
    }


def main() -> None:
    p = argparse.ArgumentParser(description="Morpheus TPU load test")
    p.add_argument("--base-url", default="http://127.0.0.1:5005")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--requests", type=int, default=4)
    p.add_argument("--voice", default="tara")
    args = p.parse_args()
    print(json.dumps(asyncio.run(main_async(args))))


if __name__ == "__main__":
    main()
