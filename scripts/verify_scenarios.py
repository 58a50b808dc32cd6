#!/usr/bin/env python3
"""Run all scenes and validate artifact envelopes.

Functional parity with reference scripts/verify_scenarios.py:13-50: every
timeline event must carry base64 PCM (no file paths) and a buffer depth
within [0, 1000] ms.  Exit code 1 on any violation.
"""
from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scenes import ALL_SCENES  # noqa: E402


def validate_event(event: dict) -> list[str]:
    errors = []
    pcm = event.get("pcm")
    if not isinstance(pcm, str) or pcm == "":
        if event.get("duration_ms", 0) > 0:
            errors.append(f"chunk {event.get('chunk_id')}: missing base64 pcm")
    if isinstance(pcm, str) and ("/" == pcm[:1] or pcm.endswith(".wav")):
        errors.append(f"chunk {event.get('chunk_id')}: pcm looks like a file path")
    depth = event.get("buffer_ms", 0.0)
    if not (0.0 <= depth <= 1000.0):
        errors.append(f"chunk {event.get('chunk_id')}: buffer_ms {depth} out of [0,1000]")
    return errors


def main() -> int:
    failures = []
    with tempfile.TemporaryDirectory() as tmp:
        for name, scene in ALL_SCENES.items():
            _, _, result = scene.run(Path(tmp))
            timeline = result["timeline"] if isinstance(result, dict) else result
            for event in timeline:
                for err in validate_event(event):
                    failures.append(f"{name}: {err}")
            print(f"scene {name}: {len(timeline)} events ok")
    if failures:
        print("\n".join(failures))
        return 1
    print("all scenarios verified")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
