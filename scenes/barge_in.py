"""Barge-in scene: interruption mid-utterance resets the adapter.

Shape asserted: stream terminates after the barge-in chunk boundary, the
adapter's reset hook fires, and fewer chunks than planned are emitted
(reference scenes/barge_in.py:8-37).
"""
from __future__ import annotations

from project_morpheus_tpu.orchestrator import AudioChunk

from .utils import run_scene


class InterruptibleAdapter:
    """Emits uniform 10 ms chunks until told to stop."""

    name = "interruptible"

    def __init__(self, total: int = 5) -> None:
        self.total = total
        self.sent = 0
        self.reset_called = False

    async def pull(self, _size: int) -> AudioChunk:
        if self.sent >= self.total:
            return AudioChunk(pcm=b"", duration_ms=0.0, eos=True)
        self.sent += 1
        return AudioChunk(pcm=b"\x05\x00" * 160, duration_ms=10.0)

    async def reset(self) -> None:
        self.reset_called = True


def run(out_dir):
    adapter = InterruptibleAdapter()
    timeline_path, wav_path, timeline = run_scene(
        "barge_in", adapter, out_dir, barge_in_at=2
    )
    return timeline_path, wav_path, {
        "timeline": timeline,
        "reset_called": adapter.reset_called,
        "planned_chunks": adapter.total,
    }
