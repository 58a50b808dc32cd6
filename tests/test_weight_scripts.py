"""Real-weight gate scripts: convert_snac round-trip + fidelity gate.

The snac package's sequential-module key naming is reconstructed here by
inverting the converter's rename map, so the rename logic is exercised
end-to-end without the (non-redistributable) checkpoint; the same code
path ingests the real ``snac_24khz`` weights unchanged.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from project_morpheus_tpu.codec import SNACConfig  # noqa: E402
from project_morpheus_tpu.codec.weights import (  # noqa: E402
    params_from_torch_state,
    random_torch_state,
)

import convert_snac  # noqa: E402


@pytest.fixture(scope="module")
def tiny_cfg():
    return SNACConfig.tiny()


def _as_snac_naming(state, cfg):
    """Canonical names -> the snac package's sequential-module names."""
    inv = {
        dst: src
        for src, dst in convert_snac.snac_rename_map(cfg, True).items()
    }
    assert set(state) <= set(inv), sorted(set(state) - set(inv))[:5]
    return {inv[k]: v for k, v in state.items()}


def test_convert_snac_roundtrip(tiny_cfg, tmp_path):
    canonical = random_torch_state(tiny_cfg, seed=5)
    snac_named = _as_snac_naming(canonical, tiny_cfg)

    out = convert_snac.convert(snac_named, tiny_cfg)
    assert set(out) == set(canonical)
    for k in canonical:
        np.testing.assert_array_equal(out[k], canonical[k])
    # and the result builds the decode pytree
    params_from_torch_state(out, tiny_cfg)


def test_convert_snac_passthrough_canonical(tiny_cfg):
    canonical = random_torch_state(tiny_cfg, seed=6)
    out = convert_snac.convert(canonical, tiny_cfg)
    assert set(out) == set(canonical)


def test_convert_snac_unmapped_key_strict(tiny_cfg):
    snac_named = _as_snac_naming(random_torch_state(tiny_cfg, seed=7), tiny_cfg)
    snac_named["decoder.model.999.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        convert_snac.convert(snac_named, tiny_cfg)
    # lenient mode drops it with a warning
    out = convert_snac.convert(snac_named, tiny_cfg, strict=False)
    assert "decoder.model.999.weight" not in out


def test_convert_snac_weight_norm_folding(tiny_cfg):
    """A parametrised (weight-norm) checkpoint folds before renaming."""
    canonical = random_torch_state(tiny_cfg, seed=8)
    snac_named = _as_snac_naming(canonical, tiny_cfg)
    # split one conv into weight_v/weight_g with g = ||v|| (identity fold)
    key = "decoder.model.1.weight"
    w = snac_named.pop(key)
    g = np.sqrt(np.sum(w**2, axis=(1, 2), keepdims=True))
    snac_named[key[:-6] + "weight_v"] = w
    snac_named[key[:-6] + "weight_g"] = g
    out = convert_snac.convert(snac_named, tiny_cfg)
    np.testing.assert_allclose(
        out["decoder.in_pw.weight"], canonical["decoder.in_pw.weight"],
        rtol=1e-6,
    )


def test_decode_only_checkpoint_builds(tiny_cfg):
    """Encoder-less state dicts build a decode-only pytree (serving path)."""
    state = {
        k: v
        for k, v in random_torch_state(tiny_cfg, seed=9).items()
        if not k.startswith("encoder.")
    }
    params = params_from_torch_state(state, tiny_cfg)
    assert params["encoder"] is None and params["decoder"] is not None


def test_fidelity_gate_skips_cleanly(monkeypatch, capsys):
    """No weights supplied -> exit 2 with explicit skip messages."""
    import fidelity_gate

    monkeypatch.delenv("ORPHEUS_SNAC_PATH", raising=False)
    monkeypatch.delenv("ORPHEUS_CHECKPOINT_PATH", raising=False)
    rc = fidelity_gate.main([])
    out = capsys.readouterr().out
    assert rc == 2
    assert "SKIP" in out and "convert_snac" in out


def test_fidelity_gate_snac_gates_pass(monkeypatch, tmp_path, capsys):
    """Random tiny weights through the real gate functions: PASS."""
    import fidelity_gate

    pytest.importorskip("torch")
    monkeypatch.setattr(
        SNACConfig, "snac_24khz", classmethod(lambda cls: SNACConfig.tiny())
    )
    npz = tmp_path / "snac.npz"
    np.savez(npz, **random_torch_state(SNACConfig.tiny(), seed=12))
    monkeypatch.setenv("ORPHEUS_SNAC_PATH", str(npz))
    monkeypatch.delenv("ORPHEUS_CHECKPOINT_PATH", raising=False)
    rc = fidelity_gate.main(["--wav", str(tmp_path / "g.wav")])
    out = capsys.readouterr().out
    assert "snac parity" in out and "stream gold" in out
    assert rc == 0, out
