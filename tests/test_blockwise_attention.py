"""Blockwise causal attention vs dense: values, padding, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.model import LlamaConfig, init_llama_params, llama_forward
from project_morpheus_tpu.ops.blockwise_attention import blockwise_causal_attention


def _dense_ref(q, k, v, mask):
    B, S, H, HD = q.shape
    KV = k.shape[2]
    G = H // KV
    qg = q.reshape(B, S, KV, G, HD).astype(jnp.float32) * (HD**-0.5)
    s = jnp.einsum("bqkgd,bskd->bkgqs", qg, k, preferred_element_type=jnp.float32)
    causal = jnp.tril(jnp.ones((S, S), bool))
    valid = causal[None, None, None] & mask[:, None, None, None, :]
    s = jnp.where(valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgqs,bskd->bqkgd", p.astype(v.dtype), v)
    return o.reshape(B, S, H, HD).astype(q.dtype)


def _mk(B=2, S=64, KV=2, G=2, HD=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    H = KV * G
    return (
        jax.random.normal(ks[0], (B, S, H, HD)),
        jax.random.normal(ks[1], (B, S, KV, HD)),
        jax.random.normal(ks[2], (B, S, KV, HD)),
    )


@pytest.mark.parametrize("block", [16, 32, 64])
def test_matches_dense(block):
    q, k, v = _mk()
    mask = jnp.ones((2, 64), bool)
    ref = _dense_ref(q, k, v, mask)
    got = blockwise_causal_attention(q, k, v, mask, block_q=block, block_k=block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_padding_mask():
    q, k, v = _mk(seed=1)
    mask = jnp.asarray([[True] * 40 + [False] * 24, [True] * 64])
    ref = _dense_ref(q, k, v, mask)
    got = blockwise_causal_attention(q, k, v, mask, block_q=16, block_k=16)
    # padded key positions excluded; compare only real query rows of row 0
    np.testing.assert_allclose(
        np.asarray(got[0, :40]), np.asarray(ref[0, :40]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), rtol=2e-4, atol=2e-4)


def test_gradients_match_dense():
    q, k, v = _mk(B=1, S=32, seed=2)
    mask = jnp.ones((1, 32), bool)

    def loss_block(q, k, v):
        return jnp.sum(blockwise_causal_attention(q, k, v, mask, block_q=16, block_k=16) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_ref(q, k, v, mask) ** 2)

    gb = jax.grad(loss_block, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gb, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_llama_forward_blockwise_matches_dense():
    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 32)))
    dense, _ = llama_forward(params, toks, cfg)
    block, _ = llama_forward(params, toks, cfg, attn_impl="blockwise")
    np.testing.assert_allclose(
        np.asarray(block), np.asarray(dense), rtol=5e-4, atol=5e-4
    )


def test_rejects_indivisible_seq():
    q, k, v = _mk(S=48)
    with pytest.raises(ValueError):
        blockwise_causal_attention(q, k, v, block_q=32, block_k=32)
