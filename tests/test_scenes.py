"""Scene probes: behavioral shapes + artifact envelopes.

Parity targets: reference tests/test_scenes.py:34-83 and
scripts/verify_scenarios.py envelope checks.
"""
import json
import wave

import pytest

import scenes
from scripts.verify_scenarios import validate_event


def test_barge_in_terminates_early(tmp_path):
    _, wav_path, result = scenes.barge_in.run(tmp_path / "a")
    assert result["reset_called"]
    emitted = len(result["timeline"])
    assert emitted < result["planned_chunks"]
    assert emitted == 3  # chunks 0,1,2 then barge-in observed at boundary


def test_mid_stream_swap_identity_order(tmp_path):
    _, _, result = scenes.mid_stream_swap.run(tmp_path / "b")
    names = [e["adapter"] for e in result["timeline"]]
    assert "adapter_a" in names and "adapter_b" in names
    # a-chunks strictly precede b-chunks
    last_a = max(i for i, n in enumerate(names) if n == "adapter_a")
    first_b = min(i for i, n in enumerate(names) if n == "adapter_b")
    assert last_a < first_b
    ids = [e["chunk_id"] for e in result["timeline"]]
    assert ids == list(range(len(ids)))


def test_long_read_runs_to_completion(tmp_path):
    _, wav_path, result = scenes.long_read.run(tmp_path / "c")
    assert len(result["timeline"]) == 60
    # ladder converges upward when playback never drains
    windows = [e["token_window"] for e in result["timeline"]]
    assert windows[0] == 8
    with wave.open(str(wav_path)) as wf:
        assert wf.getnframes() == 60 * 160


def test_breathing_room_short_utterance(tmp_path):
    _, _, result = scenes.breathing_room.run(tmp_path / "d")
    assert len(result["timeline"]) == 2


@pytest.mark.parametrize("name", list(scenes.ALL_SCENES))
def test_artifact_envelopes(tmp_path, name):
    timeline_path, wav_path, result = scenes.ALL_SCENES[name].run(tmp_path / name)
    timeline = json.loads(timeline_path.read_text())
    assert timeline  # artifacts written
    for event in timeline:
        assert validate_event(event) == []
        assert 0.0 <= event["buffer_ms"] <= 1000.0
    assert wav_path.exists()
