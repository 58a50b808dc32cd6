"""Int8 weight-only quantization: fidelity and engine integration."""
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
    dequantize_weight,
    embed_lookup,
    matmul_maybe_quant,
    quantize_params_int8,
    quantize_weight,
)


@pytest.fixture(scope="module")
def cfg():
    return LlamaConfig.tiny_vocab()


@pytest.fixture(scope="module")
def params(cfg):
    return init_llama_params(cfg, jax.random.key(5), dtype=jnp.float32)


def test_quantize_roundtrip_error_small():
    w = jax.random.normal(jax.random.key(0), (64, 32)) * 0.1
    leaf = quantize_weight(w)
    back = dequantize_weight(leaf, dtype=jnp.float32)
    err = jnp.abs(back - w).max() / jnp.abs(w).max()
    assert float(err) < 0.02  # int8 per-channel: <2% relative


def test_matmul_maybe_quant_close():
    w = jax.random.normal(jax.random.key(1), (64, 128)) * 0.05
    x = jax.random.normal(jax.random.key(2), (4, 64))
    exact = x @ w
    approx = matmul_maybe_quant(x, quantize_weight(w))
    rel = jnp.linalg.norm(approx - exact) / jnp.linalg.norm(exact)
    assert float(rel) < 0.02


def test_quantized_forward_close(cfg, params):
    qparams = quantize_params_int8(params)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)))
    full, _ = llama_forward(params, toks, cfg)
    quant, _ = llama_forward(qparams, toks, cfg)
    # logits should agree in ranking at most positions
    agree = (jnp.argmax(full, -1) == jnp.argmax(quant, -1)).mean()
    assert float(agree) > 0.9
    rel = jnp.linalg.norm(quant - full) / jnp.linalg.norm(full)
    assert float(rel) < 0.1


def test_quantized_decode_step(cfg, params):
    qparams = quantize_params_int8(params)
    B = 2
    cache = init_kv_cache(cfg, B, 16, dtype=jnp.float32)
    toks = jnp.asarray([3, 7], jnp.int32)
    lengths = jnp.zeros((B,), jnp.int32)
    full, _ = llama_decode_step(params, toks, cfg, cache, lengths)
    quant, _ = llama_decode_step(qparams, toks, cfg, cache, lengths)
    agree = (jnp.argmax(full, -1) == jnp.argmax(quant, -1)).mean()
    assert float(agree) >= 0.5  # tiny random model; ranking mostly holds
    assert np.all(np.isfinite(np.asarray(quant)))


def test_embed_lookup_quantized(cfg, params):
    qparams = quantize_params_int8(params)
    toks = jnp.asarray([[1, 2, 3]])
    plain = embed_lookup(params["embed"], toks, dtype=jnp.float32)
    quant = embed_lookup(qparams["embed"], toks, dtype=jnp.float32)
    rel = jnp.linalg.norm(quant - plain) / jnp.linalg.norm(plain)
    assert float(rel) < 0.02


def test_memory_halved(cfg, params):
    qparams = quantize_params_int8(params)
    def nbytes(tree):
        return sum(x.nbytes for x in jax.tree.leaves(tree))
    # fp32 baseline -> int8 is ~4x smaller; vs bf16 it would be ~2x
    assert nbytes(qparams["layers"]) < 0.30 * nbytes(params["layers"])
