"""StreamPlanner + snac_stream_step: the engine's audio hop schedule.

Feeds a code stream through the planner exactly as the engine does
(one code at a time, flush at EOS) and checks every emitted frame:

- mid-stream frames equal the prefix decode at their hop time (exact,
  <=1 LSB int16);
- flush-tail frames equal the FINAL full decode (the flush window's
  zero right pad is the prefix pad);
- frame 0 (head hop, replicated right context) is a close approximation
  of the full decode;
- frames arrive in order with no gaps or duplicates.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.codec import SNACConfig, init_snac_params
from project_morpheus_tpu.codec.frames import tokens_to_codes
from project_morpheus_tpu.codec.snac_jax import snac_decode
from project_morpheus_tpu.codec.stream_decode import (
    StreamPlanner,
    init_stream_state,
    snac_stream_step,
)


@pytest.fixture(scope="module")
def cfg():
    return SNACConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return init_snac_params(cfg, seed=3)


def _full_decode(params, frames, cfg):
    toks = jnp.asarray(np.concatenate(frames)[None, :])
    audio = snac_decode(params, tokens_to_codes(toks), cfg, noise_rng=None)
    return np.asarray((audio[0] * 32767.0).astype(jnp.int16))


def _drive(params, cfg, codes):
    """Run the engine's audio path for one lane; return {frame: pcm}."""
    planner = StreamPlanner()
    state = init_stream_state(cfg, 1)
    hop = cfg.frame_samples
    out = {}

    def run(hops):
        nonlocal state
        for h in hops:
            pcm, state = snac_stream_step(
                params,
                jnp.asarray(h.window[None, :]),
                state,
                jnp.asarray([h.commit]),
                cfg=cfg,
            )
            pcm = np.asarray(pcm[0])
            for frame_idx, ws in h.emits:
                assert frame_idx not in out, f"frame {frame_idx} re-emitted"
                out[frame_idx] = pcm[ws * hop : (ws + 1) * hop]

    for c in codes:
        run(planner.push(int(c)))
    run(planner.flush())
    return out, planner


def test_stream_matches_full_decode(cfg, params):
    rng = np.random.default_rng(0)
    N = 9
    frames = [
        rng.integers(0, cfg.codebook_size, size=(7,)).astype(np.int32)
        for _ in range(N)
    ]
    out, _ = _drive(params, cfg, np.concatenate(frames))
    assert sorted(out) == list(range(N)), "missing or extra frames"

    hop = cfg.frame_samples
    full = _full_decode(params, frames, cfg)

    def prefix(upto):
        return _full_decode(params, frames[: upto + 1], cfg)

    # mid-stream frames f in [1, N-3]: exact vs prefix decode [0..f+2]
    for f in range(1, N - 2):
        want = prefix(f + 2)[f * hop : (f + 1) * hop]
        err = np.abs(out[f].astype(np.int32) - want.astype(np.int32)).max()
        assert err <= 1, f"frame {f}: max err {err}"

    # flush tail frames: exact vs the final full decode
    for f in (N - 2, N - 1):
        want = full[f * hop : (f + 1) * hop]
        err = np.abs(out[f].astype(np.int32) - want.astype(np.int32)).max()
        assert err <= 1, f"tail frame {f}: max err {err}"

    # head frame 0: replicated right context -> approximation, not garbage
    want = full[:hop].astype(np.float64)
    got = out[0].astype(np.float64)
    noise = np.mean((got - want) ** 2)
    signal = np.mean(want**2) + 1e-9
    snr_db = 10 * np.log10(signal / (noise + 1e-9))
    assert snr_db > 5.0, f"head frame SNR {snr_db:.1f} dB"


def test_short_stream_and_partial_padding(cfg, params):
    rng = np.random.default_rng(1)
    # 10 codes = frame 0 + a 3-code partial that flush pads to frame 1
    codes = rng.integers(0, cfg.codebook_size, size=(10,)).astype(np.int32)
    out, planner = _drive(params, cfg, codes)
    assert sorted(out) == [0, 1]
    assert len(planner.frames) == 2
    np.testing.assert_array_equal(
        planner.frames[1][3:], np.full((4,), codes[-1])
    )


def test_empty_and_exact_one_frame(cfg, params):
    out, _ = _drive(params, cfg, [])
    assert out == {}

    rng = np.random.default_rng(2)
    codes = rng.integers(0, cfg.codebook_size, size=(7,)).astype(np.int32)
    out, _ = _drive(params, cfg, codes)
    assert sorted(out) == [0]  # head emit only; flush adds nothing
