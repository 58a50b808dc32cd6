"""Worker for the multi-process DCN-path tests (test_multiprocess.py).

Parametrised over the process topology via env vars so one worker serves
both exercises:

- 2 processes x 2 local devices, (data=2, model=2) mesh, mode "fsdp" —
  model axis intra-process ("ICI"), data axis across the process
  boundary ("DCN").
- 4 processes x 2 local devices, (data=4, model=2) mesh, mode
  "fsdp_tp" — the 2-D FSDPxTP layout with the data axis spanning FOUR
  process boundaries, exercising the DCNxICI axis split the fsdp_tp
  spec claims (parallel/sharding.py fsdp_tp).

Exercises the real multi-host branches: ``initialize_distributed`` with
a live coordinator, ``make_multihost_mesh``, and per-process batch
assembly via ``jax.make_array_from_process_local_data`` inside
``train_loop`` (reference: multinode FSDP training,
Orpheus-TTS/pretrain/readme.md:23).

Env knobs: ``MP_MODEL`` (model-axis size, default 2), ``MP_SHARD_MODE``
(default "fsdp"), ``MP_GLOBAL_EXAMPLES`` (default 4); the process count
comes from ``JAX_NUM_PROCESSES`` and the per-process device count from
``XLA_FLAGS``.
"""
import json
import os
import sys


def main() -> int:
    out_path = sys.argv[1]

    import jax

    from project_morpheus_tpu.parallel.mesh import (
        initialize_distributed,
        make_multihost_mesh,
    )

    nproc = int(os.environ.get("JAX_NUM_PROCESSES", "2"))
    model_ax = int(os.environ.get("MP_MODEL", "2"))
    shard_mode = os.environ.get("MP_SHARD_MODE", "fsdp")
    n_global = int(os.environ.get("MP_GLOBAL_EXAMPLES", "4"))

    assert initialize_distributed(), "process group did not form"
    assert jax.process_count() == nproc, jax.process_count()
    local = jax.local_device_count()
    assert jax.device_count() == nproc * local, jax.device_count()

    import jax.numpy as jnp

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.data import shard_for_rank
    from project_morpheus_tpu.training.pretrain import TrainConfig, train_loop

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)
    mesh = make_multihost_mesh(model=model_ax)
    assert dict(mesh.shape) == {
        "data": jax.device_count() // model_ax,
        "model": model_ax,
    }

    # strided per rank like the reference's AlternatingDistributedSampler
    # (pretrain/train.py:76-84); the same example list is rebuilt by the
    # single-process parity run in the test
    global_examples = [
        {"input_ids": [(7 * i + j) % 900 + 3 for j in range(12)]}
        for i in range(n_global)
    ]
    local_ex = shard_for_rank(
        global_examples, jax.process_index(), jax.process_count()
    )
    batches = [{"examples": local_ex, "kind": "text"} for _ in range(3)]
    tc = TrainConfig(
        learning_rate=1e-3, warmup_steps=1, total_steps=3, seq_len=12,
        log_every=100,
    )
    _, history = train_loop(
        params, cfg, iter(batches), tc=tc, mesh=mesh, shard_mode=shard_mode
    )

    with open(out_path, "w") as f:
        json.dump(
            {
                "rank": jax.process_index(),
                "losses": history["text_loss"],
            },
            f,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
