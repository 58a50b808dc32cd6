"""Memory-efficient blockwise causal attention (training path).

The reference trains at seq 8192 with flash-attention-2 CUDA kernels
(pretrain/train.py:170); a dense XLA attention would materialise
``(B, H, S, S)`` scores (tens of GB at 8k).  This implementation streams
key/value blocks through an online-softmax accumulator with ``lax.scan`` —
O(S * block) memory, MXU-sized matmuls, and full autodiff support (the
backward pass is the scanned VJP, no custom kernel needed).  A Pallas
fwd/bwd kernel can swap in underneath the same signature later.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.checkpoint, static_argnums=(4, 5))
def _blockwise_attn(
    q: jnp.ndarray,          # (B, S, KV, G, HD) fp32-scaled queries
    k: jnp.ndarray,          # (B, S, KV, HD)
    v: jnp.ndarray,          # (B, S, KV, HD)
    attn_mask: jnp.ndarray,  # (B, S) True = real token
    block_q: int,
    block_k: int,
):
    B, S, KV, G, HD = q.shape
    nq = S // block_q
    nk = S // block_k

    q_blocks = q.reshape(B, nq, block_q, KV, G, HD)
    k_blocks = k.reshape(B, nk, block_k, KV, HD)
    v_blocks = v.reshape(B, nk, block_k, KV, HD)
    mask_blocks = attn_mask.reshape(B, nk, block_k)

    q_pos = jnp.arange(S).reshape(nq, block_q)
    k_pos = jnp.arange(S).reshape(nk, block_k)

    def per_qblock(qi):
        qb = q_blocks[:, qi]  # (B, bq, KV, G, HD)

        def kv_step(carry, inputs):
            m, l, acc = carry
            kb, vb, mb, kp = inputs  # (B, bk, KV, HD), ..., (B, bk), (bk,)
            s = jnp.einsum(
                "bqkgd,bskd->bkgqs", qb, kb, preferred_element_type=jnp.float32
            )
            causal = q_pos[qi][:, None] >= kp[None, :]  # (bq, bk)
            valid = causal[None, None, None] & mb[:, None, None, None, :]
            s = jnp.where(valid, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[..., None])
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum(
                "bkgqs,bskd->bkgqd", p.astype(vb.dtype), vb,
                preferred_element_type=jnp.float32,
            )
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((B, KV, G, block_q), -1e30, jnp.float32)
        l0 = jnp.zeros((B, KV, G, block_q), jnp.float32)
        acc0 = jnp.zeros((B, KV, G, block_q, HD), jnp.float32)
        # only key blocks that can be visible to this query block
        n_vis = qi * block_q // block_k + (block_q + block_k - 1) // block_k
        n_vis = min(n_vis, nk)
        inputs = (
            jnp.moveaxis(k_blocks[:, :n_vis], 1, 0),
            jnp.moveaxis(v_blocks[:, :n_vis], 1, 0),
            jnp.moveaxis(mask_blocks[:, :n_vis], 1, 0),
            k_pos[:n_vis],
        )
        (m, l, acc), _ = lax.scan(kv_step, (m0, l0, acc0), inputs)
        out = acc / jnp.maximum(l, 1e-30)[..., None]  # (B, KV, G, bq, HD)
        return jnp.einsum("bkgqd->bqkgd", out)

    outs = [per_qblock(qi) for qi in range(nq)]
    out = jnp.concatenate(outs, axis=1)  # (B, S, KV, G, HD)
    return out


def blockwise_causal_attention(
    q: jnp.ndarray,  # (B, S, H, HD)
    k: jnp.ndarray,  # (B, S, KV, HD)
    v: jnp.ndarray,  # (B, S, KV, HD)
    attn_mask: Optional[jnp.ndarray] = None,  # (B, S)
    *,
    block_q: int = 256,  # 512 -> 256: the seq-8192 backward materialises
    block_k: int = 256,  # the per-qblock f32 score blocks stacked (384 MB
    # at 512; halved at 256) — part of the single-chip training budget
) -> jnp.ndarray:
    """Causal GQA attention without materialising the score matrix.

    Returns ``(B, S, H, HD)`` in the query dtype.  Sequence length must be
    divisible by the block sizes (clamped automatically).
    """
    B, S, H, HD = q.shape
    KV = k.shape[2]
    G = H // KV
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    if S % block_q or S % block_k:
        raise ValueError(f"seq len {S} must be divisible by blocks {block_q}/{block_k}")
    if attn_mask is None:
        attn_mask = jnp.ones((B, S), bool)
    qs = (q.reshape(B, S, KV, G, HD).astype(jnp.float32)) * (HD**-0.5)
    out = _blockwise_attn(qs, k, v, attn_mask, block_q, block_k)
    return out.reshape(B, S, H, HD).astype(q.dtype)
