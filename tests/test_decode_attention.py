"""Pallas decode attention vs dense oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.ops import decode_attention, decode_attention_reference


def _mk(B=2, S=512, KV=2, G=3, HD=128, seed=0, dtype=jnp.float32):
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    H = KV * G
    q = jax.random.normal(k1, (B, H, HD), dtype)
    k = jax.random.normal(k2, (B, KV, S, HD), dtype)
    v = jax.random.normal(k3, (B, KV, S, HD), dtype)
    return q, k, v


@pytest.mark.parametrize("lengths", [[512, 512], [100, 300], [1, 257]])
def test_matches_reference(lengths):
    q, k, v = _mk()
    lengths = jnp.asarray(lengths, jnp.int32)
    ref = decode_attention_reference(q, k, v, lengths)
    got = decode_attention(q, k, v, lengths, block_s=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_partial_block_masking():
    # length not a multiple of block_s: tail positions must not leak
    q, k, v = _mk(B=1, S=512, seed=3)
    l1 = jnp.asarray([130], jnp.int32)
    got = decode_attention(q, k, v, l1, block_s=128, interpret=True)
    ref = decode_attention_reference(q, k, v, l1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
    # garbage beyond the length must not change the result
    k2 = k.at[:, :, 130:].set(1e9)
    v2 = v.at[:, :, 130:].set(-1e9)
    got2 = decode_attention(q, k2, v2, l1, block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), rtol=1e-5, atol=1e-5)


def test_zero_length_slot():
    q, k, v = _mk(B=2, S=256, seed=4)
    lengths = jnp.asarray([0, 256], jnp.int32)
    got = decode_attention(q, k, v, lengths, block_s=128, interpret=True)
    ref = decode_attention_reference(q, k, v, lengths)
    # slot 1 matches the oracle; slot 0 (no live keys) must be finite
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=2e-4, atol=2e-4
    )
    assert np.all(np.isfinite(np.asarray(got[0])))


def test_gqa_grouping_is_per_kv_head():
    # make kv head 1's K/V distinctive; only query heads G..2G-1 should see it
    q, k, v = _mk(B=1, S=128, KV=2, G=2, seed=5)
    lengths = jnp.asarray([128], jnp.int32)
    ref = decode_attention_reference(q, k, v, lengths)
    got = decode_attention(q, k, v, lengths, block_s=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_layered_int8_fallback_matches_dequant_reference():
    """int8-cache layered path (CPU fallback): per-position scale dequant
    must equal attention over the explicitly dequantised cache."""
    from project_morpheus_tpu.ops.decode_attention import (
        decode_attention_layered,
    )

    rng = np.random.default_rng(0)
    L, B, KV, S, HD, G = 2, 2, 2, 256, 128, 3
    H = KV * G
    q = jnp.asarray(rng.normal(size=(B, H, HD)), jnp.float32)
    kf = rng.normal(size=(L, B, KV, S, HD)).astype(np.float32)
    vf = rng.normal(size=(L, B, KV, S, HD)).astype(np.float32)
    ks = np.max(np.abs(kf), axis=-1) / 127.0 + 1e-8
    vs = np.max(np.abs(vf), axis=-1) / 127.0 + 1e-8
    k8 = np.clip(np.round(kf / ks[..., None]), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs[..., None]), -127, 127).astype(np.int8)
    lengths = jnp.asarray([100, 256], jnp.int32)
    layer = jnp.asarray(1, jnp.int32)

    got = decode_attention_layered(
        q, jnp.asarray(k8), jnp.asarray(v8), lengths, layer,
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
        interpret=True,
    )
    want = decode_attention_reference(
        q,
        jnp.asarray(k8[1].astype(np.float32) * ks[1][..., None]),
        jnp.asarray(v8[1].astype(np.float32) * vs[1][..., None]),
        lengths,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_decode_step_pallas_rejects_int8_cache():
    """The pallas decode kernel reads the bf16 head-major cache layout;
    the quantized cache is position-major (init_kv_cache layout note), so
    attn_impl=pallas on an int8 cache must refuse loudly rather than read
    transposed garbage.  (The kernel's own int8+scales support remains
    covered by test_decode_attention_int8_scales above, on arrays in the
    kernel's documented layout.)"""
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.llama import init_kv_cache, llama_decode_step

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)
    B, S = 2, 64
    lengths = jnp.asarray([5, 9], jnp.int32)
    cache = init_kv_cache(cfg, B, S, jnp.int8)
    toks = jnp.asarray([3, 8], jnp.int32)
    with pytest.raises(NotImplementedError):
        llama_decode_step(
            params, toks, cfg, cache, lengths, attn_impl="pallas"
        )
