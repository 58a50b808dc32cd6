"""Stateful streaming SNAC decode: gold equivalence vs prefix decode.

The streaming hop at time t (window [t-3..t], zero right pad) must emit
frame t-2 EXACTLY as ``snac_decode`` of the full prefix frames[0..t] does
— cached tails replace recomputation without approximation.  (A full-
sequence decode differs only beyond the 2-frame lookahead cone; the
prefix oracle shares the same right edge.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.codec import SNACConfig, init_snac_params
from project_morpheus_tpu.codec.frames import tokens_to_codes
from project_morpheus_tpu.codec.snac_jax import snac_decode
from project_morpheus_tpu.codec.stream_decode import (
    EMIT_SLOT,
    WINDOW_FRAMES,
    init_stream_state,
    reset_lanes,
    snac_stream_step,
)


@pytest.fixture(scope="module")
def cfg():
    return SNACConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return init_snac_params(cfg, seed=3)


def _prefix_oracle(params, frames, t, cfg):
    """snac_decode over frames[0..t]; int16 slice of frame t-2."""
    toks = jnp.asarray(frames[: t + 1].reshape(1, -1))
    audio = snac_decode(params, tokens_to_codes(toks), cfg, noise_rng=None)
    hop = cfg.frame_samples
    e = t - 2
    return np.asarray(
        (audio[0, e * hop : (e + 1) * hop] * 32767.0).astype(jnp.int16)
    )


def test_stream_equals_prefix_decode(cfg, params):
    rng = np.random.default_rng(0)
    N = 10
    frames = rng.integers(0, cfg.codebook_size, size=(N, 7)).astype(np.int32)

    state = init_stream_state(cfg, 1)
    commit = jnp.ones((1,), bool)
    hop = cfg.frame_samples
    for t in range(3, N):
        window = jnp.asarray(frames[t - 3 : t + 1].reshape(1, -1))
        pcm, state = snac_stream_step(params, window, state, commit, cfg=cfg)
        want = _prefix_oracle(params, frames, t, cfg)
        got = np.asarray(pcm[0, EMIT_SLOT * hop : (EMIT_SLOT + 1) * hop])
        # int16 rounding at fp32: allow off-by-one LSB from reassociation
        assert np.max(np.abs(got.astype(np.int32) - want.astype(np.int32))) <= 1, (
            f"hop t={t}: max err "
            f"{np.max(np.abs(got.astype(np.int32) - want.astype(np.int32)))}"
        )


def test_masked_lane_keeps_state_and_batch_matches_single(cfg, params):
    rng = np.random.default_rng(1)
    N = 8
    frames = rng.integers(0, cfg.codebook_size, size=(N, 7)).astype(np.int32)
    garbage = rng.integers(0, cfg.codebook_size, size=(N, 7)).astype(np.int32)

    s1 = init_stream_state(cfg, 1)
    s2 = init_stream_state(cfg, 2)
    ones = jnp.ones((1,), bool)
    mask = jnp.asarray([True, False])

    for t in range(3, N):
        w1 = jnp.asarray(frames[t - 3 : t + 1].reshape(1, -1))
        w2 = jnp.asarray(
            np.stack(
                [
                    frames[t - 3 : t + 1].reshape(-1),
                    garbage[t - 3 : t + 1].reshape(-1),
                ]
            )
        )
        p1, s1 = snac_stream_step(params, w1, s1, ones, cfg=cfg)
        p2, s2 = snac_stream_step(params, w2, s2, mask, cfg=cfg)
        hop = cfg.frame_samples
        sl = slice(EMIT_SLOT * hop, (EMIT_SLOT + 1) * hop)
        np.testing.assert_array_equal(np.asarray(p1[0, sl]), np.asarray(p2[0, sl]))

    for k, v in s2.items():
        np.testing.assert_array_equal(
            np.asarray(v[1]), np.zeros_like(np.asarray(v[1])),
            err_msg=f"masked lane state mutated: {k}",
        )


def test_reset_lanes(cfg, params):
    state = init_stream_state(cfg, 2)
    state = {k: v + 1.0 for k, v in state.items()}
    state = reset_lanes(state, jnp.asarray([True, False]))
    for v in state.values():
        assert float(np.abs(np.asarray(v[0])).max()) == 0.0
        assert float(np.abs(np.asarray(v[1])).min()) == 1.0


def test_window_shape_contract(cfg):
    assert WINDOW_FRAMES == 4 and EMIT_SLOT == 1


def test_exact_stream_decoder_matches_prefix_oracle(cfg, params):
    """The single-lane facade (remote/pypi paths) must emit exactly what a
    full prefix decode does at every mid-stream frame — the same quality
    the engine's batched audio path serves."""
    from project_morpheus_tpu.codec.stream_decode import ExactStreamDecoder

    rng = np.random.default_rng(7)
    N = 9
    frames = rng.integers(0, cfg.codebook_size, size=(N, 7)).astype(np.int32)

    dec = ExactStreamDecoder(params, cfg)
    hops = []
    for code in frames.reshape(-1):
        hops.extend(dec.push_tokens([int(code)]))
    hops.extend(dec.flush())
    assert len(hops) == N  # one hop per frame, head to flushed tail

    for t in range(3, N):  # steady-state frames have exact prefix context
        want = _prefix_oracle(params, frames, t, cfg)
        got = hops[t - 2]
        assert np.max(
            np.abs(got.astype(np.int32) - want.astype(np.int32))
        ) <= 1


def test_make_stream_decoder_modes(cfg, params):
    from project_morpheus_tpu.codec.stream_decode import (
        ExactStreamDecoder,
        make_stream_decoder,
    )
    from project_morpheus_tpu.codec.streaming import StreamingSnacDecoder

    assert isinstance(make_stream_decoder(params, cfg), ExactStreamDecoder)
    assert isinstance(
        make_stream_decoder(params, cfg, mode="native"), ExactStreamDecoder
    )
    w = make_stream_decoder(params, cfg, mode="windowed")
    assert isinstance(w, StreamingSnacDecoder) and w.mode == "native"
    p = make_stream_decoder(params, cfg, mode="parity")
    assert isinstance(p, StreamingSnacDecoder) and p.mode == "parity"
    with pytest.raises(ValueError):
        make_stream_decoder(params, cfg, mode="bogus")


@pytest.mark.slow
def test_stream_equals_prefix_decode_full_topology():
    """Gold equivalence at the REAL snac_24khz dims: cached-tail streaming
    hops equal the prefix decode at production size, not just tiny."""
    from project_morpheus_tpu.codec import init_snac_params as _init

    full = SNACConfig.snac_24khz()
    fparams = _init(full, seed=4)
    rng = np.random.default_rng(2)
    N = 6
    frames = rng.integers(0, full.codebook_size, size=(N, 7)).astype(np.int32)

    state = init_stream_state(full, 1)
    commit = jnp.ones((1,), bool)
    hop = full.frame_samples
    for t in range(3, N):
        window = jnp.asarray(frames[t - 3 : t + 1].reshape(1, -1))
        pcm, state = snac_stream_step(fparams, window, state, commit, cfg=full)
        want = _prefix_oracle(fparams, frames, t, full)
        got = np.asarray(pcm[0, EMIT_SLOT * hop : (EMIT_SLOT + 1) * hop])
        assert np.max(
            np.abs(got.astype(np.int32) - want.astype(np.int32))
        ) <= 1
