"""Mid-stream swap scene: adapter identity flips during an utterance.

Shape asserted: the timeline shows adapter_a events strictly before
adapter_b events with no gap in chunk ids (reference scenes/mid_stream_swap.py).
"""
from __future__ import annotations

from project_morpheus_tpu.orchestrator import AudioChunk

from .utils import run_scene


class IdentitySwapAdapter:
    def __init__(self, switch_after: int = 3, total: int = 6) -> None:
        self.name = "adapter_a"
        self.switch_after = switch_after
        self.total = total
        self.sent = 0

    async def pull(self, _size: int) -> AudioChunk:
        if self.sent >= self.total:
            return AudioChunk(pcm=b"", duration_ms=0.0, eos=True)
        self.sent += 1
        tone = b"\x03\x00" if self.name == "adapter_a" else b"\x04\x00"
        if self.sent == self.switch_after:
            self.name = "adapter_b"
        return AudioChunk(
            pcm=tone * 160, duration_ms=10.0, eos=self.sent >= self.total
        )

    async def reset(self) -> None:
        return None


def run(out_dir):
    adapter = IdentitySwapAdapter()
    timeline_path, wav_path, timeline = run_scene("mid_stream_swap", adapter, out_dir)
    return timeline_path, wav_path, {"timeline": timeline}
