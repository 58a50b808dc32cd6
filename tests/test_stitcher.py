"""Stitcher: crossfade math, tail holdback, drift guard, EOS flush."""
import asyncio

import numpy as np

from project_morpheus_tpu.orchestrator import AudioChunk, stitch_chunks
from project_morpheus_tpu.orchestrator.stitcher import crossfade


async def _gen(chunks):
    for c in chunks:
        yield c


def _run(chunks, **kw):
    async def go():
        return [c async for c in stitch_chunks(_gen(chunks), **kw)]

    return asyncio.run(go())


def _chunk(samples, eos=False):
    arr = np.asarray(samples, dtype=np.int16)
    return AudioChunk(pcm=arr.tobytes(), duration_ms=len(arr) / 16.0, eos=eos)


def test_concat_mode_passthrough():
    out = _run([_chunk([1, 2, 3]), _chunk([4, 5, 6], eos=True)], sample_rate=16000)
    joined = np.concatenate([np.frombuffer(c.pcm, np.int16) for c in out])
    assert joined.tolist() == [1, 2, 3, 4, 5, 6]
    assert out[-1].eos


def test_crossfade_math_exact():
    tail = np.asarray([100, 100], np.int16)
    head = np.asarray([200, 200, 7], np.int16)
    out = crossfade(tail, head, overlap=2)
    # linear fades over 2 samples: out = tail*[1,.5] + head*[0,.5]
    assert out.tolist() == [100, 150, 7]


def test_overlap_holdback_and_flush():
    # overlap of 2 samples @16k = 0.125ms -> use overlap_ms to get 2 samples
    chunks = [_chunk([10, 10, 10, 10]), _chunk([20, 20, 20, 20])]
    out = _run(chunks, sample_rate=16000, overlap_ms=2 / 16.0)
    # first emit holds back 2 samples; the crossfade consumes the 2-sample
    # overlap (8 -> 6); stream end flushes the held tail as EOS
    total = np.concatenate([np.frombuffer(c.pcm, np.int16) for c in out])
    assert total.size == 6
    assert out[-1].eos


def test_drift_guard_small_chunk():
    # chunk smaller than the overlap is accumulated, not emitted
    chunks = [_chunk([5]), _chunk([6]), _chunk([7, 8, 9, 10], eos=True)]
    out = _run(chunks, sample_rate=16000, overlap_ms=3 / 16.0)
    total = np.concatenate([np.frombuffer(c.pcm, np.int16) for c in out])
    # nothing lost or duplicated beyond the crossfaded overlaps
    assert out[-1].eos
    assert total.size >= 4


def test_markers_suppressed_by_default():
    chunks = [
        AudioChunk(pcm=b"\x01\x00", duration_ms=1, markers={"w": 1}),
        AudioChunk(pcm=b"\x02\x00", duration_ms=1, markers={"w": 2}, eos=True),
    ]
    out = _run(chunks, sample_rate=16000)
    assert all(c.markers is None for c in out)
    out2 = _run(list(chunks), sample_rate=16000, emit_markers=True)
    assert out2[-1].markers == {"w": 2}
