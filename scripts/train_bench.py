#!/usr/bin/env python3
"""Time the reference pretrain recipe's step on real hardware.

The reference's operational anchor is "3b on 8 h100s fsdp, at bf16, 8192
works well" (Orpheus-TTS/pretrain/train.py:142).  This measures the
single-chip member of that recipe on the v5e: one fwd/bwd/update step of
the 3B model at seq 8192 (blockwise attention + per-layer remat — the
auto-selected long-seq posture), and records step time, tokens/s and the
HBM high-water mark into ``TRAIN_r04.json``.

Optimizer note: AdamW's two fp32 moments (~25 GB with params+grads) do
not fit one 16 GiB chip — that is exactly why the reference shards with
FSDP over 8 devices; the multi-device FSDP path here is exercised by
``__graft_entry__.dryrun_multichip``.  On one chip this benchmark uses
adafactor (factored second moments, <100 MB state), which preserves the
full fwd/bwd/update structure and memory-bounds the honest single-chip
claim.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.pretrain import make_train_step

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = LlamaConfig.orpheus_3b()
        dtype = jnp.bfloat16
        B, S = 1, 8192
        iters = 3
    else:
        cfg = LlamaConfig.tiny_vocab()
        dtype = jnp.float32
        B, S = 2, 128
        iters = 2

    params = init_llama_params(cfg, jax.random.key(0), dtype=dtype)
    # adafactor's native RMS update clipping instead of an optax.chain with
    # clip_by_global_norm (one less full gradient-tree temporary)
    optimizer = optax.adafactor(learning_rate=1e-5, clipping_threshold=1.0)
    grad_groups = 4 if on_tpu else 0
    if on_tpu:
        # params + grads alone are 12.7 of the 15.75 GiB: the monolithic
        # fwd/bwd program OOMs on its backward temporaries (18.1 GiB).
        # make_grouped_grad_step computes the EXACT same step in 4
        # gradient passes (one layer group each, all at the original
        # params) + one update — peak holds one group's temporaries.
        from project_morpheus_tpu.training.pretrain import (
            group_layer_params,
            make_grouped_grad_step,
        )

        params = group_layer_params(params, grad_groups)
        step_fn = make_grouped_grad_step(
            cfg, optimizer, grad_groups, attn_impl="auto", remat="auto"
        )
    else:
        step_fn = make_train_step(cfg, optimizer, attn_impl="auto",
                                  remat="auto")
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    ids = rng.integers(10, 100_000 if on_tpu else 900, size=(B, S))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((B, S), bool),
        "labels": jnp.asarray(ids, jnp.int32),
    }

    params, opt_state, loss = step_fn(params, opt_state, batch)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step_fn(params, opt_state, batch)
    loss_val = float(loss)  # forces the chain
    step_s = (time.perf_counter() - t0) / iters

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    result = {
        "recipe": "3b_seq8192_bf16_blockwise_remat" if on_tpu
                  else "tiny_cpu_smoke",
        "platform": jax.default_backend(),
        "batch": B,
        "seq_len": S,
        "grad_groups": grad_groups,  # exact step in N gradient passes
        # (params+grads = 12.7/15.75 GiB; see make_grouped_grad_step)
        "optimizer": "adafactor (AdamW needs >=8-device FSDP; see "
                     "dryrun_multichip)",
        "step_ms": round(step_s * 1000, 1),
        "tokens_per_s": round(B * S / step_s, 1),
        "loss": round(loss_val, 4),
        "peak_hbm_gib": round(peak / 2**30, 2) if peak else None,
        "reference": "Orpheus-TTS/pretrain/train.py:142",
    }
    out = Path(__file__).resolve().parent.parent / "TRAIN_r04.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
