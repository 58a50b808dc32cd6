"""Sampling: greedy, top-p nucleus truncation, repetition penalty, presence."""
import jax
import jax.numpy as jnp
import numpy as np

from project_morpheus_tpu.model.sampling import (
    SamplingParams,
    init_sampler_state,
    note_tokens,
    reset_slots,
    sample_logits,
)


def _sample(logits, key=0, temp=1.0, top_p=1.0, pen=1.0, presence=None, vocab=None):
    logits = jnp.asarray(logits, jnp.float32)
    B, V = logits.shape
    if presence is None:
        presence = jnp.zeros((B, V), bool)
    return np.asarray(
        sample_logits(
            logits,
            jax.random.key(key),
            temperature=jnp.full((B,), temp, jnp.float32),
            top_p=jnp.full((B,), top_p, jnp.float32),
            repetition_penalty=jnp.full((B,), pen, jnp.float32),
            presence=jnp.asarray(presence),
            vocab_size=vocab or V,
        )
    )


def test_greedy_at_zero_temperature():
    logits = [[0.1, 5.0, -1.0, 2.0]]
    for k in range(5):
        assert _sample(logits, key=k, temp=0.0)[0] == 1


def test_padded_vocab_never_sampled():
    # entries >= vocab_size have huge logits but must be masked out
    logits = [[0.0, 1.0, 100.0, 100.0]]
    for k in range(10):
        assert _sample(logits, key=k, temp=1.0, vocab=2)[0] in (0, 1)


def test_top_p_truncates_tail():
    # one dominant token (p ~ 0.97): top_p=0.5 keeps only it
    logits = [[10.0, 2.0, 1.0, 0.0]]
    for k in range(20):
        assert _sample(logits, key=k, temp=1.0, top_p=0.5)[0] == 0


def test_top_p_keeps_at_least_one():
    logits = [[1.0, 1.0, 1.0, 1.0]]
    out = _sample(logits, key=3, temp=1.0, top_p=1e-3)
    assert out[0] in range(4)


def test_repetition_penalty_discourages_seen():
    # token 0 seen; with a huge penalty it loses to token 1 under greedy
    logits = [[2.0, 1.9, -5.0, -5.0]]
    presence = [[True, False, False, False]]
    assert _sample(logits, temp=0.0, pen=1.0, presence=presence)[0] == 0
    assert _sample(logits, temp=0.0, pen=2.0, presence=presence)[0] == 1


def test_repetition_penalty_negative_logits():
    # HF semantics: negative logits are multiplied (pushed further down)
    logits = [[-1.0, -1.1, -9.0, -9.0]]
    presence = [[True, False, False, False]]
    assert _sample(logits, temp=0.0, pen=2.0, presence=presence)[0] == 1


def test_note_and_reset_state():
    st = init_sampler_state(2, 8)
    st = note_tokens(st, jnp.asarray([[1, 2], [3, 4]]))
    p = np.asarray(st["presence"])
    assert p[0, 1] and p[0, 2] and p[1, 3] and p[1, 4]
    st = reset_slots(st, jnp.asarray([True, False]))
    p = np.asarray(st["presence"])
    assert not p[0].any() and p[1, 3]


def test_note_tokens_respects_mask():
    st = init_sampler_state(1, 8)
    st = note_tokens(st, jnp.asarray([[5, 6]]), mask=jnp.asarray([[True, False]]))
    p = np.asarray(st["presence"])
    assert p[0, 5] and not p[0, 6]


def test_sampling_params_clipping():
    sp = SamplingParams(temperature=9.0, top_p=2.0, repetition_penalty=0.5).clipped()
    assert sp.temperature == 1.5 and sp.top_p == 1.0 and sp.repetition_penalty == 1.0


def test_raw_uint32_keys_rejected():
    """A raw uint32 PRNGKey has shape (2,) — indistinguishable by shape
    from a 2-slot typed-key batch, so sample_logits demands typed keys
    (jax.random.key) and raises on raw key data (ADVICE r4)."""
    import pytest

    from project_morpheus_tpu.model.sampling import sample_logits

    logits = jnp.zeros((2, 8), jnp.float32)
    raw = jax.random.PRNGKey(0)  # legacy uint32 (2,) key
    with pytest.raises(TypeError, match="typed PRNG keys"):
        sample_logits(
            logits,
            raw,
            temperature=jnp.ones((2,)),
            top_p=jnp.ones((2,)),
            repetition_penalty=jnp.ones((2,)),
            presence=jnp.zeros((2, 8), bool),
            vocab_size=8,
        )
