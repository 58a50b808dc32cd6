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
