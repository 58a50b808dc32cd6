"""LoRA adapters for the decoder (reference finetune/lora.py:28-74).

Defaults mirror the reference recipe: r=32, alpha=64, adapters on every
projection matrix (q/k/v/o/gate/up/down), rslora scaling
(alpha / sqrt(r)), optional trainable embedding, and merge-and-unload
export producing plain dense weights.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..model.config import LlamaConfig

PROJ_NAMES = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")

# output dims of each projection as a function of the config
def _proj_dims(cfg: LlamaConfig) -> Dict[str, Tuple[int, int]]:
    D, F = cfg.hidden_size, cfg.intermediate_size
    H, KV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    return {
        "wq": (D, H * HD),
        "wk": (D, KV * HD),
        "wv": (D, KV * HD),
        "wo": (H * HD, D),
        "wg": (D, F),
        "wu": (D, F),
        "wd": (F, D),
    }


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 32
    alpha: float = 64.0
    rslora: bool = True  # scale alpha / sqrt(r) instead of alpha / r
    train_embed: bool = False


def lora_scale(lc: LoraConfig) -> float:
    return lc.alpha / (math.sqrt(lc.rank) if lc.rslora else lc.rank)


def init_lora_params(
    cfg: LlamaConfig,
    lc: LoraConfig,
    key: jax.Array,
    dtype=jnp.float32,
) -> Dict:
    """A zero-initialised-B / gaussian-A adapter pytree (delta starts at 0)."""
    dims = _proj_dims(cfg)
    L = cfg.num_layers
    layers: Dict[str, Dict[str, jnp.ndarray]] = {}
    keys = jax.random.split(key, len(PROJ_NAMES))
    for k, name in zip(keys, PROJ_NAMES):
        fan_in, fan_out = dims[name]
        layers[name] = {
            "a": (
                jax.random.normal(k, (L, fan_in, lc.rank), jnp.float32)
                * (1.0 / math.sqrt(fan_in))
            ).astype(dtype),
            "b": jnp.zeros((L, lc.rank, fan_out), dtype),
        }
    out: Dict = {"layers": layers}
    if lc.train_embed:
        out["embed_delta"] = jnp.zeros((cfg.padded_vocab, cfg.hidden_size), dtype)
    return out


def merge_lora(params: Dict, lora: Dict, lc: LoraConfig) -> Dict:
    """Merge-and-unload: dense weights absorbing the low-rank deltas."""
    s = lora_scale(lc)
    merged_layers = dict(params["layers"])
    for name in PROJ_NAMES:
        if name not in lora["layers"]:
            continue
        a = lora["layers"][name]["a"]
        b = lora["layers"][name]["b"]
        delta = jnp.einsum(
            "ldr,lro->ldo", a.astype(jnp.float32), b.astype(jnp.float32)
        )
        w = params["layers"][name]
        merged_layers[name] = (w.astype(jnp.float32) + s * delta).astype(w.dtype)
    merged = dict(params)
    merged["layers"] = merged_layers
    if "embed_delta" in lora:
        merged["embed"] = (
            params["embed"].astype(jnp.float32) + lora["embed_delta"]
        ).astype(params["embed"].dtype)
    return merged


def make_lora_train_step(cfg: LlamaConfig, lc: LoraConfig, optimizer):
    """Jitted step updating only the adapters (frozen base params)."""
    from .pretrain import causal_lm_loss

    s = lora_scale(lc)

    @jax.jit
    def step(lora, opt_state, params, batch):
        def loss_fn(lora_):
            return causal_lm_loss(params, batch, cfg, lora=lora_, lora_scale=s)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = jax.tree.map(lambda p, u: p + u, lora, updates)
        return lora, opt_state, loss

    return step
