"""FSDP-equivalent pretraining via pjit parameter sharding.

The reference trains Llama-3B with torch FSDP auto-wrap over 8 ranks at
bf16/seq-8192 (pretrain/train.py:187-200, config.yaml).  Here the same
recipe is one jitted step: parameters sharded over the mesh ``data`` axis
(ZeRO-3), batches data-parallel, XLA inserting all-gather/reduce-scatter
over ICI.  Loss streams are split text/audio by position-in-cycle for
logging parity (:115-126).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..model.config import LlamaConfig
from ..model.llama import llama_forward
from ..parallel import batch_shardings, make_mesh, param_shardings
from .data import IGNORE_LABEL


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 5e-5
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 10_000
    max_grad_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.95
    seq_len: int = 8192
    save_steps: int = 5000  # reference pretrain/config.yaml cadence
    log_every: int = 10


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.learning_rate,
        warmup_steps=tc.warmup_steps,
        decay_steps=max(tc.total_steps, tc.warmup_steps + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(
            schedule, b1=tc.b1, b2=tc.b2, weight_decay=tc.weight_decay
        ),
    )


def causal_lm_loss(
    params, batch: Dict[str, jnp.ndarray], cfg: LlamaConfig, lora=None, lora_scale=1.0
) -> jnp.ndarray:
    """Next-token cross entropy with -100 labels ignored."""
    logits, _ = llama_forward(
        params,
        batch["input_ids"],
        cfg,
        attn_mask=batch["attention_mask"],
        lora=lora,
        lora_scale=lora_scale,
    )
    logits = logits[:, :-1]
    labels = batch["labels"][:, 1:]
    mask = labels != IGNORE_LABEL
    safe = jnp.where(mask, labels, 0)
    ll = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    return jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1)


def make_train_step(
    cfg: LlamaConfig,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """One jitted fwd/bwd/update step; shard params+batch before calling."""

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(causal_lm_loss)(params, batch, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_loop(
    params,
    cfg: LlamaConfig,
    batches: Iterable[Dict],
    tc: Optional[TrainConfig] = None,
    mesh=None,
    log: Optional[Callable[[Dict], None]] = None,
    checkpoint_dir: Optional[str] = None,
    collate: Optional[Callable] = None,
) -> Tuple[object, Dict]:
    """Drive interleaved batches through the sharded step.

    ``batches`` yields ``{"kind": "text"|"audio", "examples": [...]}`` from
    ``BatchedRatioDataset``; losses are logged under separate text/audio
    streams keyed by kind (reference :115-126).
    """
    from .data import pad_collate

    tc = tc or TrainConfig()
    collate = collate or (lambda ex: pad_collate(ex, max_len=tc.seq_len))
    optimizer = make_optimizer(tc)

    if mesh is None:
        mesh = make_mesh(model=1)
    pshard = param_shardings(cfg, mesh, mode="fsdp")
    params = jax.device_put(params, pshard)
    opt_state = optimizer.init(params)
    bshard = batch_shardings(mesh)
    step_fn = make_train_step(cfg, optimizer)

    history: Dict[str, list] = {"text_loss": [], "audio_loss": []}
    start = time.monotonic()
    step_idx = 0
    for batch_spec in batches:
        if step_idx >= tc.total_steps:
            break
        batch = collate(batch_spec["examples"])
        batch = {k: jax.device_put(jnp.asarray(v), bshard) for k, v in batch.items()}
        params, opt_state, loss = step_fn(params, opt_state, batch)
        loss_val = float(loss)
        stream = f"{batch_spec['kind']}_loss"
        history.setdefault(stream, []).append(loss_val)
        if log is not None and step_idx % tc.log_every == 0:
            log(
                {
                    "step": step_idx,
                    stream: loss_val,
                    "elapsed_s": time.monotonic() - start,
                }
            )
        if checkpoint_dir and step_idx > 0 and step_idx % tc.save_steps == 0:
            from .checkpoint import save_params

            save_params(checkpoint_dir, params, step=step_idx)
        step_idx += 1
    return params, history
