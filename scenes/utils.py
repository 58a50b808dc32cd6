"""Scene runner: drive the orchestrator, capture timeline + WAV artifacts.

TPU-edition counterpart of the reference scenes/utils.py:20-75 — scenes are
hermetic (mock adapters, 16 kHz synthetic fixtures) and every chunk event
records base64 PCM, wall-clock timestamp, duration and buffer depth so a
run can be audited or replayed (utils/replay.py).
"""
from __future__ import annotations

import asyncio
import json
import time
import wave
from pathlib import Path
from typing import Optional

from project_morpheus_tpu.orchestrator import (
    ChunkLadder,
    Orchestrator,
    PlaybackBuffer,
)

SCENE_SAMPLE_RATE = 16_000  # synthetic fixtures; production audio is 24 kHz
ARTIFACT_DIR = Path("SCENES/_artifacts")


def run_scene(
    scene_name: str,
    adapter,
    out_dir: Path,
    barge_in_at: Optional[int] = None,
    artifact_dir: Optional[Path] = None,
):
    """Execute one scene; returns (timeline_path, wav_path, timeline)."""
    buffer = PlaybackBuffer(capacity_ms=1000)
    orch = Orchestrator(adapter, buffer, ChunkLadder())
    orch.log_transcript(scene_name)
    timeline: list[dict] = []
    audio = bytearray()
    t0 = time.perf_counter()

    async def drive():
        pending: list[dict] = []
        async for chunk in orch.stream(on_event=pending.append):
            event = pending.pop(0)
            audio.extend(chunk.pcm)
            timeline.append(
                {
                    **event,
                    "timestamp_ms": (time.perf_counter() - t0) * 1000.0,
                    "duration_ms": chunk.duration_ms,
                    "buffer_ms": buffer.depth_ms,
                }
            )
            if barge_in_at is not None and event["chunk_id"] == barge_in_at:
                orch.signal_barge_in()

    asyncio.run(drive())

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    wav_path = out_dir / f"{scene_name}.wav"
    with wave.open(str(wav_path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(SCENE_SAMPLE_RATE)
        wf.writeframes(bytes(audio))

    timeline_path = out_dir / f"{scene_name}.json"
    timeline_path.write_text(json.dumps(timeline, indent=2), encoding="utf-8")

    orch.save_timeline((artifact_dir or ARTIFACT_DIR) / "timeline.json")
    return timeline_path, wav_path, timeline
