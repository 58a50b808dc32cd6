"""Streaming hop decoder: cadence, continuity, parity-mode window semantics.

Parity targets: reference speechpipe.py:191-293 (tokens_decoder windows and
EOS flush) and :122 (the [2048:4096] hop-slice contract).
"""
import numpy as np
import pytest

from project_morpheus_tpu.codec import (
    SNACConfig,
    StreamingSnacDecoder,
    init_snac_params,
    snac_decode,
    tokens_to_codes,
)


@pytest.fixture(scope="module")
def cfg():
    return SNACConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return init_snac_params(cfg, seed=3)


def _trace(n_tokens, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4096, size=(n_tokens,)).tolist()


def test_native_first_chunk_after_7_tokens(params, cfg):
    dec = StreamingSnacDecoder(params, cfg, mode="native")
    hops = dec.push_tokens(_trace(6))
    assert hops == []
    hops = dec.push_tokens(_trace(1, seed=9))
    assert len(hops) == 1
    assert hops[0].shape == (cfg.frame_samples,)
    assert hops[0].dtype == np.int16


def test_native_steady_state_cadence(params, cfg):
    dec = StreamingSnacDecoder(params, cfg, mode="native", lookahead_frames=2)
    trace = _trace(7 * 10)
    hops = []
    for tok in trace:
        hops.extend(dec.push_tokens([tok]))
    # frame 0 immediately, frames 1..7 once 2-frame lookahead satisfied
    assert len(hops) == 8
    hops.extend(dec.flush())
    assert len(hops) == 10  # all frames emitted after flush
    for h in hops:
        assert h.shape == (cfg.frame_samples,)


def test_native_flush_pads_partial_frame(params, cfg):
    dec = StreamingSnacDecoder(params, cfg, mode="native")
    hops = list(dec.push_tokens(_trace(10)))  # 1 full frame + 3 tokens
    assert len(hops) == 1  # frame 0 emitted immediately (first-chunk rule)
    hops += dec.flush()
    total = sum(h.shape[0] for h in hops)
    assert total == 2 * cfg.frame_samples  # partial frame padded to full


def test_native_emits_every_frame_once(params, cfg):
    """Continuity: emitted hop e must match the same frame decoded from a
    centered window — no rewinds or skips (fixes reference 49-window quirk)."""
    dec = StreamingSnacDecoder(params, cfg, mode="native", lookahead_frames=2)
    trace = _trace(7 * 12, seed=4)
    hops = list(dec.push_tokens(trace)) + list(dec.flush())
    assert len(hops) == 12

    frames = np.asarray(trace, dtype=np.int32).reshape(12, 7)
    for e in (5, 6, 7):  # interior frames: full real context both sides
        idx = np.clip(np.arange(e - 4, e + 3), 0, 11)
        window = frames[idx].reshape(1, -1)
        codes = tokens_to_codes(window)
        audio = np.asarray(snac_decode(params, list(codes), cfg))[0]
        expect = (audio[4 * cfg.frame_samples : 5 * cfg.frame_samples] * 32767.0).astype(np.int16)
        # jit vs eager float reassociation can flip the last int16 bit
        np.testing.assert_allclose(hops[e], expect, atol=1)


def test_parity_first_chunk_is_empty(params, cfg):
    # Reference quirk: first window = 7 tokens -> 2048 samples; slice
    # [2048:4096] is empty (speechpipe.py:122,231-241).
    dec = StreamingSnacDecoder(params, cfg, mode="parity")
    hops = dec.push_tokens(_trace(7))
    assert len(hops) == 1 and hops[0].shape == (0,)


def test_parity_window_selection(params, cfg):
    """Replicates reference window maths: at count=28 decode buffer[-28:],
    emitting samples [2048:4096] (= frame 1 of the 4-frame window)."""
    dec = StreamingSnacDecoder(params, cfg, mode="parity")
    trace = _trace(7 * 4, seed=2)
    hops = []
    for tok in trace:
        hops.extend(dec.push_tokens([tok]))
    # first (empty) chunk at 7, skip at 14/21, real chunk at 28
    assert len(hops) == 2
    frames = np.asarray(trace, dtype=np.int32).reshape(4, 7)
    codes = tokens_to_codes(frames.reshape(1, -1))
    audio = np.asarray(snac_decode(params, list(codes), cfg))[0]
    expect = (audio[2048:4096] * 32767.0).astype(np.int16)
    np.testing.assert_allclose(hops[1], expect, atol=1)


def test_parity_eos_padding(params, cfg):
    # 10 tokens: flush pads with repeats of last token to 28 (reference :279-293)
    dec = StreamingSnacDecoder(params, cfg, mode="parity")
    trace = _trace(10, seed=6)
    dec.push_tokens(trace)
    hops = dec.flush()
    assert len(hops) == 1
    padded = trace + [trace[-1]] * 18
    frames = np.asarray(padded, dtype=np.int32).reshape(1, -1)
    codes = tokens_to_codes(frames)
    audio = np.asarray(snac_decode(params, list(codes), cfg))[0]
    expect = (audio[2048:4096] * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(hops[0], expect)


def test_reset(params, cfg):
    dec = StreamingSnacDecoder(params, cfg)
    dec.push_tokens(_trace(20))
    dec.reset()
    assert dec.frames_buffered == 0
    assert dec.push_tokens(_trace(6)) == []
