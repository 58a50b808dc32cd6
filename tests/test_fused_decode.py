"""Serving fast path: fused wqkv/wgu weights and bucketed decode attention.

The engine fuses projections at startup and the decode step reads only a
static bucket prefix of the KV cache (DECISIONS r1-011).  Both transforms
must be numerically equivalent to the canonical separate-weight, full-cache
path (reference semantics: llama.cpp decode, llama_local.py:62-87).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.model import (
    LlamaConfig,
    init_kv_cache,
    init_llama_params,
    llama_decode_step,
    llama_forward,
)
from project_morpheus_tpu.model.quant import (
    fuse_layer_weights,
    quantize_params_int8,
)


@pytest.fixture(scope="module")
def cfg():
    return LlamaConfig.tiny_vocab()


@pytest.fixture(scope="module")
def params(cfg):
    return init_llama_params(cfg, jax.random.key(7), dtype=jnp.float32)


def _decode_chain(params, cfg, n_steps=3, bucket=None, max_len=32, ctx=5):
    """Prefill a 2-slot batch then run a few decode steps; return logits."""
    B = 2
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, ctx)), jnp.int32)
    cache = init_kv_cache(cfg, B, max_len, jnp.float32)
    logits, cache = llama_forward(
        params, toks, cfg, cache=cache,
        cache_offset=jnp.zeros((B,), jnp.int32),
        cache_slots=jnp.arange(B),
    )
    lengths = jnp.full((B,), ctx, jnp.int32)
    last = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    outs = []
    for _ in range(n_steps):
        logits, cache = llama_decode_step(
            params, last, cfg, cache, lengths, bucket=bucket
        )
        outs.append(logits)
        last = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lengths = lengths + 1
    return jnp.stack(outs)


def test_fused_weights_match_separate(cfg, params):
    fused = fuse_layer_weights(params)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    a = _decode_chain(params, cfg)
    b = _decode_chain(fused, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_weights_idempotent(cfg, params):
    fused = fuse_layer_weights(params)
    assert fuse_layer_weights(fused)["layers"] is not None
    # second call must not raise or duplicate


def test_fused_int8_matches_separate_int8(cfg, params):
    """Per-output-column scales concatenate losslessly."""
    sep = quantize_params_int8(params)
    fused_then_quant = quantize_params_int8(fuse_layer_weights(params))
    quant_then_fused = fuse_layer_weights(sep)
    a = _decode_chain(quant_then_fused, cfg)
    b = _decode_chain(fused_then_quant, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_full_forward_matches(cfg, params):
    toks = jnp.asarray(
        np.random.default_rng(0).integers(1, cfg.vocab_size, size=(2, 9)),
        jnp.int32,
    )
    a, _ = llama_forward(params, toks, cfg)
    b, _ = llama_forward(fuse_layer_weights(params), toks, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bucketed_decode_matches_full(cfg, params):
    """bucket < max_seq must be exact while all lengths stay < bucket."""
    full = _decode_chain(params, cfg, bucket=None, max_len=64)
    bucketed = _decode_chain(params, cfg, bucket=16, max_len=64)
    np.testing.assert_allclose(np.asarray(full), np.asarray(bucketed), atol=1e-5)


def test_decode_step_writes_cache_in_bounds(cfg, params):
    """The DUS write lands at position lengths[b] in the full cache even
    when the attention bucket is smaller than the write position bound."""
    B, max_len, ctx = 2, 32, 5
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, ctx)), jnp.int32)
    cache = init_kv_cache(cfg, B, max_len, jnp.float32)
    _, cache = llama_forward(
        params, toks, cfg, cache=cache,
        cache_offset=jnp.zeros((B,), jnp.int32),
        cache_slots=jnp.arange(B),
    )
    lengths = jnp.asarray([ctx, ctx + 2], jnp.int32)
    before = np.asarray(cache["k"])
    _, cache = llama_decode_step(
        params, jnp.asarray([3, 4], jnp.int32), cfg, cache, lengths, bucket=16
    )
    after = np.asarray(cache["k"])
    # rows at the write positions changed; all later rows untouched
    assert not np.allclose(after[:, 0, :, ctx], before[:, 0, :, ctx])
    assert not np.allclose(after[:, 1, :, ctx + 2], before[:, 1, :, ctx + 2])
    np.testing.assert_array_equal(
        after[:, 0, :, ctx + 1 :], before[:, 0, :, ctx + 1 :]
    )
    np.testing.assert_array_equal(
        after[:, 1, :, ctx + 3 :], before[:, 1, :, ctx + 3 :]
    )
