"""Long-read scene: sustained narration.

Shape asserted: many uniform chunks stream to completion and the chunk
ladder converges upward while the playback buffer stays shallow
(reference scenes/long_read.py).
"""
from __future__ import annotations

from project_morpheus_tpu.orchestrator import AudioChunk

from .utils import run_scene


class NarrationAdapter:
    name = "narration"

    def __init__(self, total: int = 60) -> None:
        self.total = total
        self.sent = 0

    async def pull(self, _size: int) -> AudioChunk:
        if self.sent >= self.total:
            return AudioChunk(pcm=b"", duration_ms=0.0, eos=True)
        self.sent += 1
        return AudioChunk(
            pcm=b"\x02\x00" * 160, duration_ms=10.0, eos=self.sent >= self.total
        )

    async def reset(self) -> None:
        return None


def run(out_dir):
    adapter = NarrationAdapter()
    timeline_path, wav_path, timeline = run_scene("long_read", adapter, out_dir)
    return timeline_path, wav_path, {"timeline": timeline}
