"""SNAC decoder waveform parity: JAX implementation vs torch oracle.

This is the round-1 instantiation of the BASELINE gate "fixed SNAC token
trace -> WAV allclose" (BASELINE.json config 1).  Both sides load identical
random weights from the shared torch-layout state dict, so conv-layout
conversion, transposed-conv semantics, snake activation and RVQ upsampling
are all under test.  Noise blocks are zeroed on both sides (deterministic
decode); with real snac_24khz weights the same harness applies unchanged.
"""
import numpy as np
import pytest

from project_morpheus_tpu.codec import (
    SNACConfig,
    snac_decode,
    tokens_to_codes,
)
from project_morpheus_tpu.codec.weights import (
    params_from_torch_state,
    random_torch_state,
    fold_weight_norm,
)

torch = pytest.importorskip("torch")

from project_morpheus_tpu.codec.torch_oracle import SnacDecoderOracle  # noqa: E402


@pytest.fixture(scope="module")
def tiny_cfg():
    return SNACConfig.tiny()


@pytest.fixture(scope="module")
def tiny_state(tiny_cfg):
    return random_torch_state(tiny_cfg, seed=7)


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg, tiny_state):
    return params_from_torch_state(tiny_state, tiny_cfg)


@pytest.fixture(scope="module")
def oracle(tiny_cfg, tiny_state):
    m = SnacDecoderOracle(tiny_cfg)
    m.load_state(tiny_state)
    m.eval()
    return m


def _random_codes(cfg, n_frames, batch=1, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, cfg.codebook_size, size=(batch, n_frames * 7), dtype=np.int32)
    return tokens_to_codes(toks)


def test_decode_output_shape(tiny_cfg, tiny_params):
    codes = _random_codes(tiny_cfg, n_frames=4)
    audio = snac_decode(tiny_params, [np.asarray(c) for c in codes], tiny_cfg)
    # 4 frames x 4 fine codes x hop 512 = 8192 samples
    assert audio.shape == (1, 4 * tiny_cfg.frame_samples)
    assert tiny_cfg.frame_samples == 2048


def test_waveform_allclose_vs_oracle(tiny_cfg, tiny_params, oracle):
    for seed in (0, 1, 2):
        codes = _random_codes(tiny_cfg, n_frames=7, seed=seed)
        got = np.asarray(snac_decode(tiny_params, list(codes), tiny_cfg))
        want = oracle.decode(codes)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_waveform_allclose_batched(tiny_cfg, tiny_params, oracle):
    codes = _random_codes(tiny_cfg, n_frames=4, batch=3, seed=5)
    got = np.asarray(snac_decode(tiny_params, list(codes), tiny_cfg))
    want = oracle.decode(codes)
    assert got.shape == want.shape == (3, 4 * tiny_cfg.frame_samples)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_output_in_tanh_range(tiny_cfg, tiny_params):
    codes = _random_codes(tiny_cfg, n_frames=4)
    audio = np.asarray(snac_decode(tiny_params, list(codes), tiny_cfg))
    assert np.all(audio <= 1.0) and np.all(audio >= -1.0)


def test_fold_weight_norm_identity():
    # g set to ||v|| -> folded weight equals v
    v = np.random.default_rng(0).normal(size=(4, 3, 7)).astype(np.float32)
    g = np.sqrt(np.sum(v**2, axis=(1, 2), keepdims=True))
    state = {"m.weight_v": v, "m.weight_g": g, "other": np.ones(2, np.float32)}
    folded = fold_weight_norm(state)
    np.testing.assert_allclose(folded["m.weight"], v, rtol=1e-6)
    assert "other" in folded and "m.weight_v" not in folded


def test_noise_rng_changes_output(tiny_cfg, tiny_params):
    import jax

    codes = _random_codes(tiny_cfg, n_frames=4)
    a = snac_decode(tiny_params, list(codes), tiny_cfg, noise_rng=None)
    b = snac_decode(tiny_params, list(codes), tiny_cfg, noise_rng=jax.random.key(0))
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_full_snac24khz_topology_parity():
    """Full ``snac_24khz`` topology (decoder_dim 1536, real rates/strides)
    with random weights: a layout bug that only manifests at the real dims
    would pass every tiny gate and fail here (VERDICT r2 next #2).  The
    same harness ingests the real checkpoint via scripts/convert_snac.py +
    scripts/fidelity_gate.py."""
    cfg = SNACConfig.snac_24khz()
    state = random_torch_state(cfg, seed=11)
    params = params_from_torch_state(state, cfg)
    m = SnacDecoderOracle(cfg)
    m.load_state(state)
    m.eval()
    codes = _random_codes(cfg, n_frames=4, seed=5)
    got = np.asarray(snac_decode(params, list(codes), cfg))
    want = m.decode(codes)
    assert got.shape == want.shape == (1, 4 * cfg.frame_samples)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)
