"""Adapter layer: registry descriptors, local adapter chunking, remote SSE."""
import asyncio
import json

import httpx
import pytest

from project_morpheus_tpu.adapters import VoiceSchema, registry
from project_morpheus_tpu.adapters.runtime import (
    MockEngine,
    audio_code_from_token_id,
    get_runtime,
)
from project_morpheus_tpu.model.config import ORPHEUS_SPECIAL_TOKENS
from project_morpheus_tpu.utils.text import batch_sentences, split_text_into_sentences


@pytest.fixture(autouse=True)
def mock_mode(monkeypatch):
    monkeypatch.setenv("ORPHEUS_ENGINE_MODE", "mock")
    monkeypatch.setenv("ORPHEUS_MODEL_SIZE", "tiny")
    import project_morpheus_tpu.adapters.runtime as rt

    monkeypatch.setattr(rt, "_runtime", None)
    yield


def test_registry_descriptors():
    av = registry.available()
    assert av["local_jax"]["streaming"] and av["local_jax"]["unit"] == "bytes"
    assert av["local_jax"]["granularity"] == [8, 12, 16, 24, 32, 48, 64]


def test_voice_mapper_fallback():
    adapter = registry.create(
        "local_jax", prompt="x", voice=VoiceSchema(voice="not-a-voice")
    )
    assert adapter.voice == "tara"
    adapter2 = registry.create("local_jax", prompt="x", voice=VoiceSchema(voice="leo"))
    assert adapter2.voice == "leo"


def test_audio_code_mapping():
    base = ORPHEUS_SPECIAL_TOKENS["audio_base"]
    assert audio_code_from_token_id(base + 5, 0) == 5
    assert audio_code_from_token_id(base + 4096 + 5, 1) == 5
    assert audio_code_from_token_id(base + 5, 1) is None  # wrong band
    assert audio_code_from_token_id(100, 0) is None  # text token


def test_local_adapter_pull_contract():
    async def go():
        adapter = registry.create("local_jax", prompt="hello", voice=VoiceSchema())
        sizes, chunks = [], []
        while True:
            chunk = await adapter.pull(64)
            assert len(chunk.pcm) <= 64  # never exceeds requested bytes
            chunks.append(chunk)
            if chunk.eos:
                break
        return chunks

    chunks = asyncio.run(go())
    total = sum(len(c.pcm) for c in chunks)
    assert total > 0
    assert chunks[-1].eos


def test_local_adapter_reset_midstream():
    async def go():
        adapter = registry.create("local_jax", prompt="hello", voice=VoiceSchema())
        await adapter.pull(32)
        await adapter.reset()
        # pull after reset restarts cleanly
        chunk = await adapter.pull(32)
        return chunk

    chunk = asyncio.run(go())
    assert chunk is not None


def test_mock_engine_deterministic():
    async def go():
        eng = MockEngine(tokens_per_request=14)
        r1 = await eng.submit([1, 2, 3])
        t1 = [t async for t in r1.tokens()]
        r2 = await eng.submit([1, 2, 3])
        t2 = [t async for t in r2.tokens()]
        return t1, t2

    t1, t2 = asyncio.run(go())
    assert t1 == t2 and len(t1) == 14


def test_sentence_split_and_batching():
    text = "One sentence here. Another follows! Tiny? " + "Long tail " * 5
    parts = split_text_into_sentences(text)
    assert all(len(p) >= 2 for p in parts)
    joined = " ".join(parts)
    assert "Another follows!" in joined
    batches = batch_sentences(["a" * 600, "b" * 600, "c" * 100], max_batch_chars=1000)
    assert len(batches) == 2  # 600, then 600+100 packed


def test_remote_sse_stream(monkeypatch):
    """Token SSE -> PCM via a mocked transport (reference MockTransport style)."""
    from project_morpheus_tpu.adapters import remote_backend as rb
    from project_morpheus_tpu.codec.frames import custom_number_from_audio_code

    monkeypatch.setenv("ORPHEUS_API_URL", "http://fake/v1/completions")

    # 14 valid tokens (2 frames): positions 0..13
    tokens = [
        f"<custom_token_{custom_number_from_audio_code((i * 37) % 4000 + 1, i)}>"
        for i in range(14)
    ]
    sse = b"".join(
        b'data: {"choices": [{"text": "' + t.encode() + b'"}]}\n\n' for t in tokens
    ) + b"data: [DONE]\n\n"

    def handler(request: httpx.Request) -> httpx.Response:
        assert json.loads(request.content)["stream"] is True
        return httpx.Response(200, content=sse)

    async def go():
        client = httpx.AsyncClient(transport=httpx.MockTransport(handler))
        out = []
        async for pcm in rb.stream_pcm_from_api("hi", client=client):
            out.append(pcm)
        await client.aclose()
        return out

    out = asyncio.run(go())
    assert out and all(isinstance(b, bytes) for b in out)


def test_remote_sse_retries_then_fails(monkeypatch):
    from project_morpheus_tpu.adapters import remote_backend as rb

    monkeypatch.setenv("ORPHEUS_API_URL", "http://fake/v1/completions")
    calls = {"n": 0}

    def handler(request):
        calls["n"] += 1
        return httpx.Response(500, content=b"boom")

    async def go():
        client = httpx.AsyncClient(transport=httpx.MockTransport(handler))
        try:
            async for _ in rb.generate_tokens_from_api("x", client=client):
                pass
        finally:
            await client.aclose()

    with pytest.raises(httpx.HTTPStatusError):
        asyncio.run(go())
    assert calls["n"] == 3  # exponential-backoff retry budget


def test_local_adapter_buffer_bounded_without_pulls():
    """The producer must stop draining the engine once max_buffer_bytes of
    PCM is buffered (backpressure), instead of free-running the utterance
    into RAM; pulls then drain and refill to completion."""

    async def go():
        adapter = registry.create(
            "local_jax", prompt="hello world", voice=VoiceSchema()
        )
        adapter.max_buffer_bytes = 256
        first = await adapter.pull(16)  # kicks the producer
        # give the producer plenty of turns; it must park at the cap
        for _ in range(50):
            await asyncio.sleep(0.002)
        runtime = await get_runtime().ensure()
        hop_bytes = runtime.snac_cfg.frame_samples * 2
        assert len(adapter._buffer) <= 256 + hop_bytes
        # draining releases the producer and the stream still terminates
        total = len(first.pcm)
        eos = first.eos
        while not eos:
            chunk = await adapter.pull(64)
            total += len(chunk.pcm)
            eos = chunk.eos
        return total

    total = asyncio.run(go())
    assert total > 256  # more audio than the cap ever held at once


def test_remote_path_pcm_identical_to_exact_decoder(monkeypatch):
    """Identical token trace -> identical PCM on the remote-SSE path and
    the exact stream decoder (one decode quality on every path)."""
    import numpy as np

    from project_morpheus_tpu.adapters import remote_backend as rb
    from project_morpheus_tpu.codec.frames import custom_number_from_audio_code
    from project_morpheus_tpu.codec.stream_decode import ExactStreamDecoder

    monkeypatch.setenv("ORPHEUS_API_URL", "http://fake/v1/completions")

    codes = [(i * 37) % 4000 + 1 for i in range(35)]  # 5 frames
    tokens = [
        f"<custom_token_{custom_number_from_audio_code(c, i)}>"
        for i, c in enumerate(codes)
    ]
    sse = b"".join(
        b'data: {"choices": [{"text": "' + t.encode() + b'"}]}\n\n'
        for t in tokens
    ) + b"data: [DONE]\n\n"

    def handler(request: httpx.Request) -> httpx.Response:
        return httpx.Response(200, content=sse)

    async def go():
        client = httpx.AsyncClient(transport=httpx.MockTransport(handler))
        out = bytearray()
        async for pcm in rb.stream_pcm_from_api("hi", client=client):
            out.extend(pcm)
        await client.aclose()
        runtime = await get_runtime().ensure()
        dec = ExactStreamDecoder(runtime.snac_params, runtime.snac_cfg)
        want = bytearray()
        for h in dec.push_tokens(codes):
            want.extend(h.tobytes())
        for h in dec.flush():
            want.extend(h.tobytes())
        return bytes(out), bytes(want)

    got, want = asyncio.run(go())
    assert len(got) > 0
    assert got == want
