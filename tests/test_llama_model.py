"""Llama decoder: shapes, causality, decode-step vs full-forward parity."""
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


@pytest.fixture(scope="module")
def cfg():
    return LlamaConfig.tiny_vocab()


@pytest.fixture(scope="module")
def params(cfg):
    return init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)


def test_forward_shapes(cfg, params):
    toks = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % cfg.vocab_size
    logits, _ = llama_forward(params, toks, cfg)
    assert logits.shape == (2, 6, cfg.padded_vocab)
    assert logits.dtype == jnp.float32


def test_causality(cfg, params):
    """Changing a future token must not affect earlier logits."""
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, size=(1, 8)).astype(np.int32)
    toks2 = toks.copy()
    toks2[0, -1] = (toks2[0, -1] + 17) % cfg.vocab_size
    l1, _ = llama_forward(params, jnp.asarray(toks), cfg)
    l2, _ = llama_forward(params, jnp.asarray(toks2), cfg)
    np.testing.assert_allclose(
        np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]))


def test_padding_mask_ignores_pad(cfg, params):
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, size=(1, 6)).astype(np.int32)
    padded = np.concatenate([toks, rng.integers(0, cfg.vocab_size, (1, 2)).astype(np.int32)], 1)
    mask = np.asarray([[True] * 6 + [False] * 2])
    l_ref, _ = llama_forward(params, jnp.asarray(toks), cfg)
    l_pad, _ = llama_forward(params, jnp.asarray(padded), cfg, attn_mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(l_ref[0]), np.asarray(l_pad[0, :6]), rtol=1e-5, atol=1e-5
    )


def test_decode_step_matches_full_forward(cfg, params):
    """AR decode against the KV cache must reproduce teacher-forced logits."""
    rng = np.random.default_rng(2)
    seq = rng.integers(0, cfg.vocab_size, size=(10,)).astype(np.int32)
    full, _ = llama_forward(params, jnp.asarray(seq[None]), cfg)

    B, prefix = 2, 4
    cache = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    # prefill the prefix into slot 1 (slot 0 left idle)
    logits, cache = llama_forward(
        params,
        jnp.asarray(seq[None, :prefix]),
        cfg,
        cache=cache,
        cache_offset=jnp.zeros((1,), jnp.int32),
        cache_slots=jnp.asarray([1]),
    )
    np.testing.assert_allclose(
        np.asarray(logits[0, prefix - 1]), np.asarray(full[0, prefix - 1]),
        rtol=2e-4, atol=2e-4,
    )

    lengths = np.zeros((B,), np.int32)
    lengths[1] = prefix
    active = np.zeros((B,), bool)
    active[1] = True
    for t in range(prefix, len(seq)):
        step_tokens = np.zeros((B,), np.int32)
        step_tokens[1] = seq[t]
        step_logits, cache = llama_decode_step(
            params,
            jnp.asarray(step_tokens),
            cfg,
            cache,
            jnp.asarray(lengths),
            active=jnp.asarray(active),
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[1]), np.asarray(full[0, t]), rtol=2e-4, atol=2e-4
        )
        lengths[1] += 1


def test_inactive_slot_logits_zeroed(cfg, params):
    B = 2
    cache = init_kv_cache(cfg, B, 16, dtype=jnp.float32)
    logits, _ = llama_decode_step(
        params,
        jnp.zeros((B,), jnp.int32),
        cfg,
        cache,
        jnp.zeros((B,), jnp.int32),
        active=jnp.asarray([False, True]),
    )
    assert np.allclose(np.asarray(logits[0]), 0.0)
    assert not np.allclose(np.asarray(logits[1]), 0.0)


def test_pallas_attn_impl_matches_dense(cfg, params):
    import jax.numpy as jnp

    B, prefix = 2, 5
    rng = np.random.default_rng(7)
    seq = rng.integers(0, cfg.vocab_size, size=(prefix,)).astype(np.int32)
    cache1 = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    cache2 = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    lengths = jnp.asarray([0, 0], jnp.int32)
    toks = jnp.asarray([seq[0], seq[1]], jnp.int32)
    l_dense, cache1 = llama_decode_step(params, toks, cfg, cache1, lengths)
    l_pallas, cache2 = llama_decode_step(
        params, toks, cfg, cache2, lengths, attn_impl="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(l_pallas), np.asarray(l_dense), rtol=3e-4, atol=3e-4
    )
    # a later step with real context
    lengths = lengths + 1
    l_dense, _ = llama_decode_step(params, toks, cfg, cache1, lengths)
    l_pallas, _ = llama_decode_step(
        params, toks, cfg, cache2, lengths, attn_impl="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(l_pallas), np.asarray(l_dense), rtol=3e-4, atol=3e-4
    )
