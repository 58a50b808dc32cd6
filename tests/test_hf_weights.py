"""HF checkpoint converter: logits parity against transformers' torch Llama.

The strongest fidelity gate available without real weights: a tiny
random-initialised ``transformers.LlamaForCausalLM`` is converted through
``hf_state_dict_to_params`` and must produce (near-)identical logits —
covering weight transposition, RoPE convention, GQA head grouping, rms
norm and the tied lm_head.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.model import LlamaConfig, llama_forward
from project_morpheus_tpu.model.hf_weights import (
    config_from_hf,
    hf_state_dict_to_params,
    load_hf_checkpoint,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=True,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    return model, hf_cfg


def test_logits_match_transformers(hf_model):
    model, hf_cfg = hf_model
    cfg = config_from_hf(hf_cfg.to_dict())
    assert cfg.vocab_size == 512 and cfg.num_kv_heads == 2

    state = {k: v.float().numpy() for k, v in model.state_dict().items()}
    params = hf_state_dict_to_params(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 512, size=(2, 12)).astype(np.int32)

    with torch.no_grad():
        ref = model(torch.from_numpy(toks).long()).logits.numpy()

    ours, _ = llama_forward(params, jnp.asarray(toks), cfg)
    ours = np.asarray(ours)[:, :, :512]

    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_decode_step_matches_transformers_incremental(hf_model):
    """AR decode through the KV cache matches torch full-context logits."""
    from project_morpheus_tpu.model import init_kv_cache, llama_decode_step

    model, hf_cfg = hf_model
    cfg = config_from_hf(hf_cfg.to_dict())
    state = {k: v.float().numpy() for k, v in model.state_dict().items()}
    params = hf_state_dict_to_params(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    toks = rng.integers(0, 512, size=(1, 8)).astype(np.int32)

    cache = init_kv_cache(cfg, 1, 32, jnp.float32)
    _, cache = llama_forward(
        params, jnp.asarray(toks[:, :5]), cfg, cache=cache,
        cache_offset=jnp.zeros((1,), jnp.int32),
        cache_slots=jnp.arange(1),
    )
    lengths = jnp.asarray([5], jnp.int32)
    outs = []
    for t in range(5, 8):
        logits, cache = llama_decode_step(
            params, jnp.asarray([toks[0, t]], jnp.int32), cfg, cache, lengths
        )
        outs.append(np.asarray(logits)[0, :512])
        lengths = lengths + 1

    with torch.no_grad():
        ref = model(torch.from_numpy(toks).long()).logits.numpy()[0]

    for i, t in enumerate(range(5, 8)):
        np.testing.assert_allclose(outs[i], ref[t], atol=3e-4, rtol=3e-3)


def test_load_hf_checkpoint_from_dir(tmp_path, hf_model):
    """Round-trip through an on-disk safetensors checkpoint directory."""
    model, hf_cfg = hf_model
    model.save_pretrained(tmp_path, safe_serialization=True)
    params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg.hidden_size == 64
    assert params["layers"]["wq"].shape == (2, 64, 64)

    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    ours, _ = llama_forward(params, toks, cfg)
    with torch.no_grad():
        ref = model(torch.tensor([[1, 2, 3, 4]])).logits.numpy()
    np.testing.assert_allclose(
        np.asarray(ours)[:, :, :512], ref, atol=2e-4, rtol=2e-3
    )


def test_tie_inference_from_state_dict(tmp_path, hf_model):
    """config.json omitting tie_word_embeddings must not drop lm_head.

    HF's LlamaConfig default is untied; a tied checkpoint omits
    lm_head.weight from the state dict.  load_hf_checkpoint infers tying
    from the state dict when the config key is absent (ADVICE r1).
    """
    model, hf_cfg = hf_model
    model.save_pretrained(tmp_path, safe_serialization=True)
    cfg_dict = json.loads((tmp_path / "config.json").read_text())
    cfg_dict.pop("tie_word_embeddings", None)
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))

    # the raw config default is now False (HF semantics)...
    assert config_from_hf(cfg_dict).tie_embeddings is False
    # ...but the loader sees no lm_head.weight in the shards and ties
    params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg.tie_embeddings is True
    assert "lm_head" not in params

    # untied state dict with omitted key -> stays untied, lm_head kept
    state = {k: v.float().numpy() for k, v in model.state_dict().items()}
    state["lm_head.weight"] = state["model.embed_tokens.weight"].copy()
    import dataclasses

    untied_cfg = dataclasses.replace(cfg, tie_embeddings=False)
    params2 = hf_state_dict_to_params(state, untied_cfg, dtype=jnp.float32)
    assert "lm_head" in params2

    # untied config with no lm_head in the shards is an error, not silence
    state.pop("lm_head.weight")
    with pytest.raises(ValueError, match="no lm_head.weight"):
        hf_state_dict_to_params(state, untied_cfg, dtype=jnp.float32)


def test_unsupported_rope_scaling_rejected(hf_model):
    _, hf_cfg = hf_model
    d = hf_cfg.to_dict()
    d["rope_scaling"] = {"rope_type": "linear", "factor": 2.0}
    with pytest.raises(ValueError, match="rope_scaling"):
        config_from_hf(d)


def test_vocab_padding_and_missing_layer_errors(hf_model):
    model, hf_cfg = hf_model
    cfg = config_from_hf(hf_cfg.to_dict())
    state = {k: v.float().numpy() for k, v in model.state_dict().items()}
    bad = dict(state)
    bad.pop("model.layers.1.mlp.gate_proj.weight")
    with pytest.raises(ValueError, match="layers missing"):
        hf_state_dict_to_params(bad, cfg, dtype=jnp.float32)

    params = hf_state_dict_to_params(state, cfg, dtype=jnp.float32)
    assert params["embed"].shape[0] == cfg.padded_vocab


def test_runtime_builds_from_hf_dir(tmp_path, hf_model, monkeypatch):
    """ORPHEUS_CHECKPOINT_PATH pointing at an HF release dir just works."""
    import asyncio

    from project_morpheus_tpu.adapters.runtime import ServingRuntime

    model, _ = hf_model
    model.save_pretrained(tmp_path, safe_serialization=True)
    monkeypatch.setenv("ORPHEUS_ENGINE_MODE", "jax")
    monkeypatch.setenv("ORPHEUS_MODEL_SIZE", "tiny")
    monkeypatch.setenv("ORPHEUS_CHECKPOINT_PATH", str(tmp_path))
    monkeypatch.setenv("ORPHEUS_MAX_SLOTS", "2")
    monkeypatch.setenv("ORPHEUS_MAX_SEQ", "64")

    rt = ServingRuntime()

    async def go():
        await rt.ensure()
        return rt.engine, rt.model_cfg

    engine, cfg = asyncio.run(go())
    assert cfg.vocab_size == 512  # picked up from the HF config.json
    assert engine is not None
