#!/usr/bin/env python3
"""Minimal realtime streaming server example.

Parity with Orpheus-TTS/realtime_streaming_example/main.py (Flask): a
single ``GET /tts?prompt=...`` route streaming a WAV while it synthesises,
built on the compat ``OrpheusModel`` facade.

    ORPHEUS_ENGINE_MODE=mock python examples/realtime_streaming.py
    curl 'http://127.0.0.1:8080/tts?prompt=Hello' -o hello.wav
"""
from __future__ import annotations

import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aiohttp import web

from project_morpheus_tpu.compat import OrpheusModel

model = OrpheusModel(model_name="orpheus-tpu")


def wav_header(sample_rate=24000) -> bytes:
    return b"RIFF" + struct.pack(
        "<I4s4sIHHIIHH4sI", 0xFFFFFFFF, b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", 0xFFFFFFFF,
    )


async def tts(request: web.Request) -> web.StreamResponse:
    prompt = request.query.get("prompt", "Hey there, looks like you forgot the prompt!")
    voice = request.query.get("voice", "tara")
    resp = web.StreamResponse(headers={"Content-Type": "audio/wav"})
    await resp.prepare(request)
    await resp.write(wav_header())
    import asyncio

    loop = asyncio.get_event_loop()
    gen = model.generate_speech(prompt=prompt, voice=voice, stop_token_ids=(128258,))
    while True:
        chunk = await loop.run_in_executor(None, lambda: next(gen, None))
        if chunk is None:
            break
        await resp.write(chunk)
    await resp.write_eof()
    return resp


def main() -> None:
    app = web.Application()
    app.router.add_get("/tts", tts)
    web.run_app(app, host="0.0.0.0", port=8080)


if __name__ == "__main__":
    main()
