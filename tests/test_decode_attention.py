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


def _mk_int8_slots(L=2, B=3, S=256, KV=2, HD=32, H=6, seed=0):
    rng = np.random.default_rng(seed)
    k8 = rng.integers(-127, 128, (L, B, S, KV, HD), dtype=np.int8)
    v8 = rng.integers(-127, 128, (L, B, S, KV, HD), dtype=np.int8)
    sc = rng.uniform(0.005, 0.02, (L, B, S, 2 * KV)).astype(np.float32)
    q = rng.standard_normal((B, H, HD)).astype(np.float32)
    return (jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8),
            jnp.asarray(sc))


def _slots_oracle(q, k8, v8, sc, lengths, layer):
    KV = k8.shape[3]
    kf = np.asarray(k8[layer], np.float32) * np.asarray(sc[layer])[..., :KV, None]
    vf = np.asarray(v8[layer], np.float32) * np.asarray(sc[layer])[..., KV:, None]
    return decode_attention_reference(
        q, jnp.swapaxes(jnp.asarray(kf), 1, 2),
        jnp.swapaxes(jnp.asarray(vf), 1, 2), lengths,
    )


@pytest.mark.parametrize("lengths", [[256, 256, 256], [5, 128, 250]])
def test_int8_slot_kernel_matches_dequant_oracle(lengths):
    """The slot-wise int8 flash kernel (pallas interpret emulates its
    DMA/double-buffering) vs dense attention over the explicitly
    dequantised cache — uniform and MIXED live lengths (the kernel's
    whole point is that traffic follows live length)."""
    from project_morpheus_tpu.ops.decode_attention import (
        decode_attention_int8_slots,
    )

    q, k8, v8, sc = _mk_int8_slots()
    lengths = jnp.asarray(lengths, jnp.int32)
    for layer in (0, 1):
        got = decode_attention_int8_slots(
            q, k8, v8, sc, lengths, jnp.asarray(layer, jnp.int32),
            block_s=64, interpret=True,
        )
        want = _slots_oracle(q, k8, v8, sc, lengths, layer)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )


def test_int8_slot_kernel_tail_garbage_ignored():
    """Positions at/after a slot's live length must not influence the
    output (garbage K/V beyond the live frontier is normal: freed slots,
    stale prefill padding)."""
    from project_morpheus_tpu.ops.decode_attention import (
        decode_attention_int8_slots,
    )

    q, k8, v8, sc = _mk_int8_slots(seed=3)
    lengths = jnp.asarray([100, 64, 200], jnp.int32)
    base = decode_attention_int8_slots(
        q, k8, v8, sc, lengths, jnp.asarray(0), block_s=64, interpret=True
    )
    k8g = k8.at[0, 0, 100:].set(127)
    v8g = v8.at[0, 0, 100:].set(-127)
    scg = sc.at[0, 0, 100:].set(1.0)
    got = decode_attention_int8_slots(
        q, k8g, v8g, scg, lengths, jnp.asarray(0), block_s=64,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), rtol=1e-5, atol=1e-5
    )


def test_int8_slot_kernel_zero_length_is_finite():
    from project_morpheus_tpu.ops.decode_attention import (
        decode_attention_int8_slots,
    )

    q, k8, v8, sc = _mk_int8_slots(seed=4)
    lengths = jnp.asarray([0, 256, 17], jnp.int32)
    got = decode_attention_int8_slots(
        q, k8, v8, sc, lengths, jnp.asarray(1), block_s=64, interpret=True
    )
    assert np.all(np.isfinite(np.asarray(got)))
    want = _slots_oracle(q, k8, v8, sc, lengths, 1)
    np.testing.assert_allclose(
        np.asarray(got[1:]), np.asarray(want[1:]), rtol=2e-4, atol=2e-4
    )


def test_decode_step_pallas_int8_matches_dense_int8():
    """llama_decode_step with attn_impl='pallas' on a quantized cache now
    routes to the slot kernel (r5: the NotImplementedError guard is gone)
    and must track the dense int8-MXU path."""
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.llama import (
        init_kv_cache,
        llama_decode_step,
        llama_forward,
    )

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)
    B, S = 2, 64
    # write a real prefix so the cache holds coherent K/V + scales
    toks = jnp.asarray(
        np.random.default_rng(0).integers(3, 900, (B, 6)), jnp.int32
    )
    cache = init_kv_cache(cfg, B, S, jnp.int8)
    _, cache = llama_forward(
        params, toks, cfg, cache=cache,
        cache_offset=jnp.zeros((B,), jnp.int32),
    )
    lengths = jnp.full((B,), 6, jnp.int32)
    nxt = jnp.asarray([3, 8], jnp.int32)
    logits_d, _ = llama_decode_step(
        params, nxt, cfg, dict(cache), lengths, attn_impl="dense"
    )
    logits_p, _ = llama_decode_step(
        params, nxt, cfg, dict(cache), lengths, attn_impl="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_d), rtol=5e-2, atol=5e-2
    )
