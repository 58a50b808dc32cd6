"""Replay tool: timeline logs -> WAV reconstruction."""
import base64
import json
import wave

from project_morpheus_tpu.utils.replay import load_events, rebuild_pcm, replay_to_wav


def _event(pcm: bytes, i=0):
    return {"chunk_id": i, "pcm": base64.b64encode(pcm).decode()}


def test_rebuild_from_array(tmp_path):
    events = [_event(b"\x01\x00", 0), _event(b"\x02\x00", 1)]
    log = tmp_path / "t.json"
    log.write_text(json.dumps(events))
    assert rebuild_pcm(load_events(log)) == b"\x01\x00\x02\x00"


def test_rebuild_from_jsonl(tmp_path):
    log = tmp_path / "t.jsonl"
    log.write_text("\n".join(json.dumps(_event(b"\x07\x00", i)) for i in range(3)))
    assert rebuild_pcm(load_events(log)) == b"\x07\x00" * 3


def test_rebuild_from_envelope(tmp_path):
    log = tmp_path / "t.json"
    log.write_text(json.dumps({"events": [_event(b"ab")], "metrics": {}}))
    assert rebuild_pcm(load_events(log)) == b"ab"


def test_replay_to_wav(tmp_path):
    log = tmp_path / "t.json"
    log.write_text(json.dumps([_event(b"\x00\x01" * 100)]))
    out = tmp_path / "out.wav"
    n = replay_to_wav(log, out, sample_rate=24000)
    assert n == 200
    with wave.open(str(out)) as wf:
        assert wf.getframerate() == 24000
        assert wf.getnframes() == 100
