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
import functools
import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..model.config import LlamaConfig
from ..model.llama import llama_forward, lm_head_logits
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
    # "auto" switches to the O(S*block)-memory blockwise attention kernel
    # and per-layer rematerialisation above LONG_SEQ_THRESHOLD — the TPU
    # equivalent of the reference's flash-attention-2 training path
    # (pretrain/train.py:170); "dense"/"blockwise" force an impl
    attn_impl: str = "auto"
    remat: str = "auto"  # "auto" | "on" | "off"


LONG_SEQ_THRESHOLD = 2048  # dense O(S^2) scores stop fitting around here


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
    params,
    batch: Dict[str, jnp.ndarray],
    cfg: LlamaConfig,
    lora=None,
    lora_scale=1.0,
    attn_impl: str = "dense",
    remat: bool = False,
    logits_chunk: int = 0,
    scan_layers: bool = True,
    accum_stack_grads: bool = False,
) -> jnp.ndarray:
    """Next-token cross entropy with -100 labels ignored.

    ``logits_chunk > 0`` switches to the CHUNKED-VOCAB loss: the forward
    returns hidden states and the lm head + softmax-xent run per sequence
    chunk under ``jax.checkpoint``, so the full ``(S, padded_vocab)`` fp32
    logits tensor (and its gradient — together ~10 GB at seq 8192 over
    the 157k vocab) never materialises.  Loss is bit-comparable to the
    dense path (same reductions, fp32 accumulation; equality-tested).
    """
    if not logits_chunk:
        logits, _ = llama_forward(
            params,
            batch["input_ids"],
            cfg,
            attn_mask=batch["attention_mask"],
            lora=lora,
            lora_scale=lora_scale,
            attn_impl=attn_impl,
            remat=remat,
            scan_layers=scan_layers,
            accum_stack_grads=accum_stack_grads,
        )
        logits = logits[:, :-1]
        labels = batch["labels"][:, 1:]
        mask = labels != IGNORE_LABEL
        safe = jnp.where(mask, labels, 0)
        ll = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
        return jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1)

    hidden, _ = llama_forward(
        params,
        batch["input_ids"],
        cfg,
        attn_mask=batch["attention_mask"],
        lora=lora,
        lora_scale=lora_scale,
        attn_impl=attn_impl,
        remat=remat,
        return_hidden=True,
        scan_layers=scan_layers,
        accum_stack_grads=accum_stack_grads,
    )  # (B, S, D)
    hidden = hidden[:, :-1]
    labels = batch["labels"][:, 1:]
    mask = labels != IGNORE_LABEL
    safe = jnp.where(mask, labels, 0)

    B, T, D = hidden.shape
    C = logits_chunk
    n_chunks = -(-T // C)
    pad = n_chunks * C - T
    hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
    safe = jnp.pad(safe, ((0, 0), (0, pad)))
    mask = jnp.pad(mask, ((0, 0), (0, pad)))
    # scan over chunks; checkpoint makes the backward recompute each
    # chunk's logits instead of storing them
    hidden = hidden.reshape(B, n_chunks, C, D).swapaxes(0, 1)
    safe = safe.reshape(B, n_chunks, C).swapaxes(0, 1)
    mask = mask.reshape(B, n_chunks, C).swapaxes(0, 1)

    @jax.checkpoint
    def chunk_loss(carry, xs):
        h_c, lab_c, m_c = xs
        logits = lm_head_logits(params, h_c)  # (B, C, padded_vocab) fp32
        ll = optax.softmax_cross_entropy_with_integer_labels(logits, lab_c)
        return carry + jnp.sum(ll * m_c), None

    total, _ = jax.lax.scan(
        chunk_loss, jnp.zeros((), jnp.float32), (hidden, safe, mask)
    )
    return total / jnp.maximum(jnp.sum(mask), 1)


def resolve_attn(seq_len: int, attn_impl: str = "auto", remat: str = "auto"):
    """Pick (attn_impl, remat) for a training sequence length."""
    long = seq_len >= LONG_SEQ_THRESHOLD
    impl = attn_impl if attn_impl != "auto" else ("blockwise" if long else "dense")
    rm = remat == "on" or (remat == "auto" and long)
    return impl, rm


# chunked-vocab loss chunk length for long sequences (auto posture): 512
# positions x 157k padded vocab = 320 MB of fp32 chunk logits vs ~5 GB
# (+5 GB gradient) for the whole sequence
LOGITS_CHUNK = 512


def group_layer_params(params: Dict, groups: int) -> Dict:
    """Split the stacked (L, ...) layer leaves into ``groups`` separate
    per-group leaves (a list of pytrees, each (L/groups, ...)).

    XLA double-buffers a scan's per-iteration outputs; in the backward
    scan those outputs are the stacked weight gradients, so one scan over
    all layers keeps 2x the full layer grads live (+3.9 GB at 3B bf16 —
    the single-chip seq-8192 OOM margin).  Grouped leaves bound the
    double-buffered gradient to one group's worth.  The grouped pytree
    feeds ``llama_forward`` (grouped branch) and any optax optimizer
    directly; ``ungroup_layer_params`` restores the canonical layout for
    checkpoints/serving.
    """
    L = params["layers"][next(iter(params["layers"]))].shape[0]
    assert L % groups == 0, f"{L} layers not divisible into {groups} groups"
    k = L // groups
    out = dict(params)
    out["layers"] = [
        jax.tree.map(lambda a: a[g * k:(g + 1) * k], params["layers"])
        for g in range(groups)
    ]
    return out


def ungroup_layer_params(params: Dict) -> Dict:
    """Inverse of :func:`group_layer_params` (concat groups back)."""
    if not isinstance(params["layers"], (list, tuple)):
        return params
    out = dict(params)
    out["layers"] = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0), *params["layers"]
    )
    return out


def make_grouped_grad_step(
    cfg: LlamaConfig,
    optimizer: optax.GradientTransformation,
    groups: int,
    attn_impl: str = "auto",
    remat: str = "auto",
) -> Callable:
    """An EXACT optimizer step whose backward runs in ``groups`` passes.

    Params + their gradients for a 3B bf16 model are 12.7 GiB — nearly
    the whole 15.75 GiB v5e — so one monolithic fwd/bwd program OOMs on
    its backward temporaries alone (measured 18.1 GiB; boundary
    activations, relayout copies of the stacked weights, zero-init
    liveness).  Here pass ``g`` recomputes the forward and differentiates
    ONLY layer group ``g`` (the other groups are non-diff constants, so
    no boundary residuals or weight-grad buffers exist for them); grads
    accumulate across passes on device and ONE update applies them all.
    Every pass sees the ORIGINAL params, so the result is bit-comparable
    to the monolithic step (equality-tested) — the price is recomputed
    forwards (~groups x fwd FLOPs), not approximation.

    Takes/returns GROUPED params (:func:`group_layer_params`).  The
    reference recipe runs this shape on 8x80 GB via FSDP
    (Orpheus-TTS/pretrain/train.py:142); this is the single-chip member.
    """

    def _loss(grp, rest, frozen, g, batch, seq):
        impl, rm = resolve_attn(seq, attn_impl, remat)
        layers = list(frozen[:g]) + [grp] + list(frozen[g:])
        p = {**rest, "layers": layers}
        return causal_lm_loss(
            p, batch, cfg, attn_impl=impl, remat=rm,
            logits_chunk=LOGITS_CHUNK if seq >= LONG_SEQ_THRESHOLD else 0,
        )

    @functools.partial(jax.jit, static_argnames=("g",))
    def pgrad(group, frozen, rest, batch, *, g):
        seq = batch["input_ids"].shape[1]
        return jax.grad(_loss)(group, rest, frozen, g, batch, seq)

    @functools.partial(jax.jit, static_argnames=("g",))
    def pgrad_last(group, frozen, rest, batch, *, g):
        seq = batch["input_ids"].shape[1]
        return jax.value_and_grad(_loss, argnums=(0, 1))(
            group, rest, frozen, g, batch, seq
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def step(params, opt_state, batch):
        layer_groups = params["layers"]
        assert isinstance(layer_groups, (list, tuple)) and len(
            layer_groups
        ) == groups, "params must come from group_layer_params(params, groups)"
        rest = {k: v for k, v in params.items() if k != "layers"}
        ggrads: list = []
        loss = None
        for g in range(groups):
            frozen = list(layer_groups[:g]) + list(layer_groups[g + 1:])
            if g < groups - 1:
                ggrads.append(
                    pgrad(layer_groups[g], frozen, rest, batch, g=g)
                )
            else:
                loss, (grp_g, rest_g) = pgrad_last(
                    layer_groups[g], frozen, rest, batch, g=g
                )
                ggrads.append(grp_g)
        grads = {**rest_g, "layers": ggrads}
        params, opt_state = apply(params, opt_state, grads)
        return params, opt_state, loss

    return step


def make_train_step(
    cfg: LlamaConfig,
    optimizer: optax.GradientTransformation,
    attn_impl: str = "auto",
    remat: str = "auto",
    scan_layers: bool = True,
    stack_grad: str = "auto",  # "auto" | "scan" | "accum": "accum" uses
    # the carry-accumulated custom-vjp layer stack (one stacked-gradient
    # copy + implicit remat — the single-chip long-seq posture); auto
    # selects it at seq >= LONG_SEQ_THRESHOLD for full-finetune params
) -> Callable:
    """One jitted fwd/bwd/update step; shard params+batch before calling.

    ``attn_impl="auto"`` resolves per traced batch shape: sequences at or
    above ``LONG_SEQ_THRESHOLD`` use blockwise attention + remat AND the
    chunked-vocab loss so the reference recipe (3B, seq 8192,
    pretrain/train.py:142) fits in HBM — a dense (B, KV, G, S, S) fp32
    score tensor at 8192 is tens of GB, and the full-sequence logits +
    gradient pair is another ~10 GB over the 157k vocab.

    ``params`` and ``opt_state`` are DONATED: XLA updates them in place
    (peak = params + grads + chunk temporaries, not 2x params).  Callers
    must use the returned values, not the arguments (donation is a no-op
    on the CPU test platform).
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        seq = batch["input_ids"].shape[1]
        impl, rm = resolve_attn(seq, attn_impl, remat)
        long = seq >= LONG_SEQ_THRESHOLD
        chunk = LOGITS_CHUNK if long else 0
        accum = stack_grad == "accum" or (
            stack_grad == "auto"
            and long
            and not isinstance(params["layers"], (list, tuple))
        )
        loss, grads = jax.value_and_grad(causal_lm_loss)(
            params, batch, cfg, attn_impl=impl,
            remat=rm and not accum,  # accum recomputes layers implicitly
            logits_chunk=chunk, scan_layers=scan_layers,
            accum_stack_grads=accum,
        )
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
    resume: bool = True,
    shard_mode: str = "fsdp",  # param_shardings mode: "fsdp" (1-D ZeRO-3)
    # or "fsdp_tp" (2-D: hidden over data/DCN, heads over model/ICI)
) -> Tuple[object, Dict]:
    """Drive interleaved batches through the sharded step.

    ``batches`` yields ``{"kind": "text"|"audio", "examples": [...]}`` from
    ``BatchedRatioDataset``; losses are logged under separate text/audio
    streams keyed by kind (reference :115-126).

    With ``checkpoint_dir`` set, the FULL trainer state (params, optimizer
    state, step) is saved every ``save_steps`` and, when ``resume`` and a
    checkpoint exists, restored — the run continues with an identical loss
    trajectory; the data cursor is replayed deterministically by skipping
    already-trained batches.
    """
    from .data import pad_collate

    tc = tc or TrainConfig()
    collate = collate or (lambda ex: pad_collate(ex, max_len=tc.seq_len))
    optimizer = make_optimizer(tc)

    if mesh is None:
        mesh = make_mesh(model=1)
    pshard = param_shardings(cfg, mesh, mode=shard_mode)
    params = jax.device_put(params, pshard)
    opt_state = optimizer.init(params)
    start_step = 0
    if checkpoint_dir and resume:
        from .checkpoint import latest_step, restore_train_state

        if latest_step(checkpoint_dir) is not None:
            restored = restore_train_state(
                checkpoint_dir,
                {
                    "params": params,
                    "opt_state": opt_state,
                    "step": np.asarray(0, np.int64),
                },
                mesh=mesh,
            )
            params = restored["params"]
            opt_state = restored["opt_state"]
            start_step = int(restored["step"])
            if log is not None:
                log({"resumed_at_step": start_step})
    bshard = batch_shardings(mesh)
    step_fn = make_train_step(cfg, optimizer, tc.attn_impl, tc.remat)
    multiproc = jax.process_count() > 1

    def globalize(arr):
        """Per-host batch shard -> global sharded array.

        Single process: a plain sharded device_put.  Multi-host: every
        process feeds its LOCAL batch (the caller shards examples by rank,
        data.shard_for_rank) and the global array is assembled over DCN —
        the pjit analogue of the reference's AlternatingDistributedSampler
        rank striding (pretrain/train.py:76-84).
        """
        if not multiproc:
            return jax.device_put(jnp.asarray(arr), bshard)
        return jax.make_array_from_process_local_data(bshard, np.asarray(arr))

    history: Dict[str, list] = {"text_loss": [], "audio_loss": []}
    start = time.monotonic()
    step_idx = 0
    for batch_spec in batches:
        if step_idx >= tc.total_steps:
            break
        if step_idx < start_step:
            step_idx += 1  # deterministic data-cursor replay
            continue
        batch = collate(batch_spec["examples"])
        batch = {k: globalize(v) for k, v in batch.items()}
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
        if checkpoint_dir and step_idx > 0 and (step_idx + 1) % tc.save_steps == 0:
            from .checkpoint import save_train_state

            save_train_state(checkpoint_dir, params, opt_state, step_idx + 1)
        step_idx += 1
    if checkpoint_dir and step_idx > start_step:
        from .checkpoint import save_train_state

        save_train_state(checkpoint_dir, params, opt_state, step_idx)
    return params, history
