"""Watermark, WAV stitching, perf monitor, compat facade, triage classify."""
import asyncio

import numpy as np
import pytest

from project_morpheus_tpu.utils import watermark as wm
from project_morpheus_tpu.utils.perf import PerformanceMonitor
from project_morpheus_tpu.utils.wav import read_wav, stitch_wav_files, write_wav


def _tone(seconds=1.0, freq=440.0, sr=24000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_watermark_roundtrip():
    audio = _tone()
    marked = wm.embed(audio)
    assert wm.verify(marked)
    assert not wm.verify(audio)  # unmarked audio rejected
    # wrong key rejected
    assert not wm.verify(marked, key=(1, 2, 3, 4, 5))


def test_watermark_int16_and_inaudibility():
    audio = (_tone() * 32767).astype(np.int16)
    marked = wm.embed(audio)
    assert marked.dtype == np.int16
    assert wm.verify(marked)
    # perturbation stays ~40 dB under signal
    noise = (marked.astype(np.float32) - audio.astype(np.float32)) / 32767.0
    snr_db = 10 * np.log10(np.mean((audio / 32767.0) ** 2) / max(np.mean(noise**2), 1e-12))
    assert snr_db > 30


def test_watermark_survives_resample_roundtrip():
    audio = _tone(seconds=2.0)
    marked = wm.embed(audio)
    rt = wm.resample(wm.resample(marked, 24000, 44100), 44100, 24000)
    rt = rt[: len(marked)]
    assert wm.verify(rt, threshold=4.0)


def test_wav_stitch(tmp_path):
    sr = 24000
    a = (np.ones(2400) * 1000).astype(np.int16)
    b = (np.ones(2400) * -1000).astype(np.int16)
    fa, fb = tmp_path / "a.wav", tmp_path / "b.wav"
    write_wav(fa, a, sr)
    write_wav(fb, b, sr)
    out = tmp_path / "out.wav"
    n = stitch_wav_files([fa, fb], out, crossfade_ms=50)
    pcm, got_sr = read_wav(out)
    assert got_sr == sr
    # 50ms = 1200 samples of overlap consumed
    assert n == pcm.size == 2400 + 2400 - 1200


def test_perf_monitor_stats():
    mon = PerformanceMonitor(report_interval_s=999)
    mon.add_tokens(82)
    mon.add_chunks(12)
    s = mon.stats()
    assert s["tokens"] == 82 and s["chunks"] == 12
    assert s["est_audio_s"] == pytest.approx(12 * 0.085)
    assert s["tokens_per_s"] > 0


def test_compat_orpheus_model(monkeypatch):
    monkeypatch.setenv("ORPHEUS_ENGINE_MODE", "mock")
    monkeypatch.setenv("ORPHEUS_MODEL_SIZE", "tiny")
    import project_morpheus_tpu.adapters.runtime as rt

    monkeypatch.setattr(rt, "_runtime", None)
    from project_morpheus_tpu.compat import OrpheusModel

    model = OrpheusModel("orpheus-tpu-test")
    toks = list(model.generate_tokens_sync("hello compat", max_tokens=20))
    assert toks and all(t.startswith("<custom_token_") for t in toks)
    chunks = list(model.generate_speech(prompt="hello audio", max_tokens=40))
    assert chunks and all(isinstance(c, bytes) for c in chunks)
    model.close()


def test_pr_triage_classify():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.pr_triage import classify

    assert classify(["project_morpheus_tpu/model/llama.py"]) == "aligned"
    assert classify(["archive/old.py"]) == "deprecated"
    assert classify(["random.txt"]) == "needs-review"


def test_local_playback_degrades_without_device():
    """Optional local playback (reference inference.py:226-242): absent
    PortAudio must degrade to counted no-ops, never raise."""
    from project_morpheus_tpu.utils import playback

    # stream_audio mirrors the reference contract
    assert playback.stream_audio(b"") is False
    assert playback.stream_audio(None) is False
    pcm = (np.sin(np.linspace(0, 440, 2048)) * 2000).astype(np.int16).tobytes()
    played = playback.stream_audio(pcm)
    assert played is playback.playback_available()

    player = playback.LocalPlayback()
    player.play(pcm)
    player.play(b"")
    player.play(pcm)
    assert player.bytes_played == 2 * len(pcm)
    player.close()
    assert player.available is False
