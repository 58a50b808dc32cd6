#!/usr/bin/env python3
"""Time the reference pretrain recipe's step on real hardware.

The reference's operational anchor is "3b on 8 h100s fsdp, at bf16, 8192
works well" (Orpheus-TTS/pretrain/train.py:142).  This measures the
single-chip member of that recipe on the v5e and records the result into
``TRAIN_r04.json`` — including, honestly, which configurations do NOT fit:

- 3B seq-8192 does not fit one 15.75 GiB chip in ANY single-chip
  formulation tried across rounds 3-4.  The r3 "grouped grad passes"
  design assumed pass temporaries scale with the differentiated group;
  compile-level memory analysis disproves it (temp = 12.69 / 13.70 /
  14.65 GiB at K = 4 / 7 / 14 — group-INDEPENDENT), dominated by
  full-stack zero-initialised gradient accumulators (3 x 1.31 GiB
  broadcast(constant) allocations) and ~44% allocator fragmentation.
  Donating params into a grad pass is structurally unusable (inputs are
  not outputs), so params+grads (12.3 GiB) always coexist with the
  temporaries.  The 8192 recipe is a multi-device (FSDP) workload — the
  reference runs it on 8x80 GB, and this repo's FSDP train step is
  exercised end-to-end on the virtual mesh (__graft_entry__.dryrun).
- The bench walks a ladder of configurations and records the first that
  fits plus every OOM attempt.

Optimizer note: AdamW's two fp32 moments (~25 GB with params+grads) do
not fit one 16 GiB chip — exactly why the reference shards with FSDP.
This benchmark uses adafactor (factored second moments, <100 MB state),
preserving the full fwd/bwd/update structure.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_single(S: int, grad_groups: int, iters: int) -> int:
    """Run ONE configuration and print its JSON result (or exit 17 on OOM).

    Each ladder attempt runs in its own subprocess: a failed attempt's
    exception traceback pins device buffers in the parent, so an in-process
    ladder OOMs every subsequent attempt too (observed).
    """
    import os

    plat = os.environ.get("TRAIN_BENCH_PLATFORM")
    import jax

    if plat:  # the axon plugin ignores JAX_PLATFORMS; use the config knob
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.pretrain import (
        group_layer_params,
        make_grouped_grad_step,
        make_train_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    cfg = LlamaConfig.orpheus_3b() if on_tpu else LlamaConfig.tiny_vocab()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B = 1 if on_tpu else 2
    optimizer = optax.adafactor(learning_rate=1e-5, clipping_threshold=1.0)
    params = init_llama_params(cfg, jax.random.key(0), dtype=dtype)
    if grad_groups:
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
    try:
        params, opt_state, loss = step_fn(params, opt_state, batch)
        loss_val = float(loss)
        import time as _t
        t0 = _t.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = step_fn(params, opt_state, batch)
        loss_val = float(loss)
        step_s = (_t.perf_counter() - t0) / iters
    except Exception as exc:
        print(json.dumps({"oom": True, "error": type(exc).__name__,
                          "detail": str(exc)[:400]}))
        return 17
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    print(json.dumps({
        "recipe": ("3b_bf16_blockwise_remat_single_chip" if on_tpu
                   else "tiny_cpu_smoke"),
        "platform": jax.default_backend(),
        "batch": B,
        "seq_len": S,
        "grad_groups": grad_groups,
        "optimizer": "adafactor (AdamW needs >=8-device FSDP; see "
                     "dryrun_multichip)",
        "step_ms": round(step_s * 1000, 1),
        "tokens_per_s": round(B * S / step_s, 1),
        "loss": round(loss_val, 4),
        "peak_hbm_gib": round(peak / 2**30, 2) if peak else None,
        "reference": "Orpheus-TTS/pretrain/train.py:142",
    }))
    return 0


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.pretrain import (
        group_layer_params,
        make_grouped_grad_step,
        make_train_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = LlamaConfig.orpheus_3b()
        dtype = jnp.bfloat16
        # (seq, grad_groups): grouped first (the r3 design), then the
        # monolithic step at shorter sequences
        ladder = [(8192, 4), (4096, 4), (2048, 0), (1024, 0)]
        iters = 3
    else:
        cfg = LlamaConfig.tiny_vocab()
        dtype = jnp.float32
        ladder = [(128, 0)]
        iters = 2

    import os
    import subprocess

    env = dict(os.environ)
    if jax.default_backend() == "cpu":
        # only the CPU override propagates: the axon TPU plugin registers
        # under its own platform name and must self-select in children
        env["TRAIN_BENCH_PLATFORM"] = "cpu"
    attempts = []
    result = None
    for S, grad_groups in ladder:
        payload = {}
        for _try in range(2):  # the remote compile helper fails transiently
            proc = subprocess.run(
                [sys.executable, __file__, "--single", str(S),
                 str(grad_groups), str(iters)],
                capture_output=True, text=True, timeout=3000, env=env,
            )
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                payload = json.loads(line)
            except json.JSONDecodeError:
                payload = {"oom": True, "error": "crash"}
            if proc.returncode == 0 and not payload.get("oom"):
                break
        if proc.returncode == 0 and not payload.get("oom"):
            result = payload
            break
        detail = payload.get("detail", "")
        status = ("remote-compile-helper-failure"
                  if "remote_compile" in detail else
                  f"OOM/{payload.get('error', 'unknown')}")
        attempts.append({
            "seq_len": S, "grad_groups": grad_groups, "status": status,
        })

    out = {
        "attempts_that_did_not_fit": attempts,
        "measured": result,
        "seq8192_note": (
            "3B seq-8192 single-chip does not fit 15.75 GiB: grad-pass "
            "temporaries are group-count-independent (12.7-14.7 GiB "
            "measured via compiled memory_analysis at K=4/7/14), "
            "dominated by full-stack zero-init grad accumulators and "
            "~44% allocator fragmentation; the recipe is the reference's "
            "8-device FSDP workload, exercised here on the virtual mesh "
            "(MULTICHIP artifact)." if on_tpu else None
        ),
    }
    path = Path(__file__).resolve().parent.parent / "TRAIN_r04.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        raise SystemExit(run_single(int(sys.argv[2]), int(sys.argv[3]),
                                    int(sys.argv[4])))
    raise SystemExit(main())
