"""Jit-safe sampling over the Orpheus 156k-token vocab.

Reference defaults (serving: temp 0.6 / top_p 0.9 / repetition 1.1, fixed —
Morpheus_Client/tts_engine/inference.py:75-105; pypi engine: temp 0.6 /
top_p 0.8 / repetition 1.3 — engine_class.py:103).  The repetition penalty
is load-bearing for audio stability per the reference comments, so it is a
first-class part of the jitted step, implemented HF/vLLM-style over all
previously seen tokens (prompt + generated) via a per-slot presence mask.

All parameters are per-slot arrays so a continuous-batching engine can mix
requests with different sampling settings in one device step.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SamplingParams:
    """Host-side per-request sampling configuration."""

    temperature: float = 0.6
    top_p: float = 0.9
    repetition_penalty: float = 1.1
    max_tokens: int = 8192
    stop_token_ids: Sequence[int] = (128258,)
    # Per-request PRNG seed: a seeded request reproduces its exact token
    # trace on every run, regardless of co-batched traffic or dispatch
    # scheduling — each slot carries its own key chain on device, advanced
    # only on steps where that lane emits (vLLM SamplingParams.seed
    # equivalence).  None draws a fresh key from the engine's stream.
    seed: Optional[int] = None

    def clipped(self) -> "SamplingParams":
        """Range clamps mirroring the server's /config validation
        (reference server.py:243-332: temp 0.1-1.5, top_p (0,1])."""
        return dataclasses.replace(
            self,
            temperature=min(max(self.temperature, 0.0), 1.5),
            top_p=min(max(self.top_p, 1e-3), 1.0),
            repetition_penalty=max(self.repetition_penalty, 1.0),
        )


def init_sampler_state(batch: int, padded_vocab: int) -> Dict[str, jnp.ndarray]:
    """Per-slot device state: which token ids have been seen."""
    return {"presence": jnp.zeros((batch, padded_vocab), jnp.bool_)}


def note_tokens(
    state: Dict[str, jnp.ndarray], tokens: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> Dict[str, jnp.ndarray]:
    """Mark ``tokens`` (B,) or (B, S) as seen; ``mask`` excludes padding."""
    presence = state["presence"]
    B = presence.shape[0]
    if tokens.ndim == 1:
        tokens = tokens[:, None]
    if mask is None:
        mask = jnp.ones(tokens.shape, bool)
    batch_idx = jnp.broadcast_to(jnp.arange(B)[:, None], tokens.shape)
    updates = jnp.where(mask, True, presence[batch_idx, tokens])
    return {"presence": presence.at[batch_idx, tokens].set(updates)}


def reset_slots(state: Dict[str, jnp.ndarray], slot_mask: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Clear presence for slots where ``slot_mask`` is True (eviction path)."""
    return {
        "presence": jnp.where(slot_mask[:, None], False, state["presence"])
    }


def sample_logits(
    logits: jnp.ndarray,          # (B, padded_vocab) fp32
    key: jax.Array,               # single key, or (B,) per-slot typed keys
    *,
    temperature: jnp.ndarray,     # (B,)
    top_p: jnp.ndarray,           # (B,)
    repetition_penalty: jnp.ndarray,  # (B,)
    presence: jnp.ndarray,        # (B, padded_vocab) bool
    vocab_size: int,
) -> jnp.ndarray:
    """Sample one token per slot; temperature==0 selects greedy argmax.

    ``key`` may be a single PRNG key (one draw spans the batch) or a
    (B,) typed-key array — one independent chain per slot, which is what
    gives seeded requests (SamplingParams.seed) schedule-independent
    determinism inside a continuous batch.
    """
    B, Vp = logits.shape
    lane = jnp.arange(Vp)[None, :]
    logits = jnp.where(lane < vocab_size, logits, -jnp.inf)

    pen = repetition_penalty[:, None]
    penalised = jnp.where(logits > 0, logits / pen, logits * pen)
    logits = jnp.where(presence, penalised, logits)

    greedy = jnp.argmax(logits, axis=-1)

    t = jnp.maximum(temperature, 1e-4)[:, None]
    scaled = logits / t

    # Nucleus (top-p) without sorting: a full-vocab sort is the dominant
    # sampling cost at 157k ids on TPU.  The nucleus {tokens with prob >=
    # tau} equals the sorted-prefix set (up to ties), and tau is found by
    # bisection on the kept probability mass — ~24 cheap masked reductions
    # instead of an O(V log V) sort.
    probs = jax.nn.softmax(scaled, axis=-1)
    lo = jnp.zeros_like(top_p)
    hi = jnp.max(probs, axis=-1)
    for _ in range(24):
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs >= mid[:, None], probs, 0.0), axis=-1)
        keep = mass >= top_p  # threshold can move higher while mass covers p
        lo = jnp.where(keep, mid, lo)
        hi = jnp.where(keep, hi, mid)
    nucleus = jnp.where(probs >= lo[:, None], scaled, -jnp.inf)

    if not jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        # a raw uint32 PRNGKey has shape (2,) — ndim 1, exactly like a
        # 2-slot typed-key batch — so shape dispatch on raw keys would
        # silently draw wrong samples; demand typed keys (jax.random.key)
        raise TypeError(
            "sample_logits requires typed PRNG keys (jax.random.key / "
            "jax.random.split of one); wrap raw uint32 key data with "
            "jax.random.wrap_key_data first"
        )
    if key.ndim == 1:  # (B,) per-slot keys: independent draw per lane
        sampled = jax.vmap(jax.random.categorical)(key, nucleus)
    else:
        sampled = jax.random.categorical(key, nucleus, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled).astype(jnp.int32)
