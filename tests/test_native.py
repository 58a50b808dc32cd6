"""Native C++ PCM ops vs the pure-Python oracles."""
import numpy as np
import pytest

from project_morpheus_tpu import native
from project_morpheus_tpu.orchestrator import RingBuffer
from project_morpheus_tpu.orchestrator.stitcher import crossfade

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native lib"
)


def test_ring_equivalence():
    nat = native.NativeRing(16)
    ref = RingBuffer(capacity=16, sample_rate=16000)
    for data, rd in [(b"abcdefgh", 3), (b"ijklmnop", 10), (b"qrstuv", 4)]:
        assert nat.write(data) == ref.write(data)
        assert nat.read(rd) == ref.read(rd)
        assert len(nat) == len(ref)
    nat.reset(); ref.reset()
    assert len(nat) == len(ref) == 0


def test_ring_wraparound_and_overflow():
    nat = native.NativeRing(8)
    assert nat.write(b"abcdef") == 6
    assert nat.read(4) == b"abcd"
    assert nat.write(b"ghijkl") == 6
    assert nat.read(8) == b"efghijkl"
    assert nat.write(b"0123456789") == 8  # truncated at capacity


def test_crossfade_matches_python():
    rng = np.random.default_rng(0)
    tail = rng.integers(-30000, 30000, 100).astype(np.int16)
    head = rng.integers(-30000, 30000, 150).astype(np.int16)
    for ov in (0, 10, 100, 200):
        got = native.crossfade_join(tail, head, ov)
        want = crossfade(tail, head, ov)
        np.testing.assert_allclose(got, want, atol=1)  # rounding at the LSB


def test_f32_to_i16_reference_semantics():
    x = np.asarray([0.0, 0.5, -0.5, 1.0, -1.0, 1.5, -1.5], np.float32)
    got = native.f32_to_i16(x)
    assert got[0] == 0
    assert got[1] == 16383  # trunc(0.5 * 32767)
    assert got[3] == 32767
    assert got[5] == 32767  # clipped
    assert got[6] == -32768


def test_meter():
    pcm = np.asarray([0, 16384, -16384, 32767], np.int16)
    rms, peak = native.meter(pcm)
    assert 0.0 < rms < 1.0
    assert peak == pytest.approx(32767 / 32768.0)
    assert native.meter(np.zeros(0, np.int16)) == (0.0, 0.0)
