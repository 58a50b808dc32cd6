"""Breathing-room scene: a short utterance ends promptly on EOS.

Shape asserted: exactly the adapter's chunks are emitted and the stream
closes on the EOS chunk (reference scenes/breathing_room.py).
"""
from __future__ import annotations

from project_morpheus_tpu.orchestrator import AudioChunk

from .utils import run_scene


class ShortUtteranceAdapter:
    name = "short_utterance"

    def __init__(self) -> None:
        self._queue = [
            AudioChunk(pcm=b"\x01\x00" * 160, duration_ms=10.0),
            AudioChunk(pcm=b"\x01\x00" * 160, duration_ms=10.0, eos=True),
        ]

    async def pull(self, _size: int) -> AudioChunk:
        if self._queue:
            return self._queue.pop(0)
        return AudioChunk(pcm=b"", duration_ms=0.0, eos=True)

    async def reset(self) -> None:
        return None


def run(out_dir):
    adapter = ShortUtteranceAdapter()
    timeline_path, wav_path, timeline = run_scene("breathing_room", adapter, out_dir)
    return timeline_path, wav_path, {"timeline": timeline}
