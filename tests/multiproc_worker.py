"""Worker for the 2-process DCN-path test (spawned by test_multiprocess.py).

Each process owns 2 virtual CPU devices; the pair forms a (data=2, model=2)
mesh — model axis intra-process (the "ICI" analogue), data axis across the
process boundary (the "DCN" analogue).  Exercises the real multi-host
branches: ``initialize_distributed`` with a live coordinator,
``make_multihost_mesh``, and per-process batch assembly via
``jax.make_array_from_process_local_data`` inside ``train_loop``
(reference: multinode FSDP training, Orpheus-TTS/pretrain/readme.md:23).
"""
import json
import sys


def main() -> int:
    out_path = sys.argv[1]

    import jax

    from project_morpheus_tpu.parallel.mesh import (
        initialize_distributed,
        make_multihost_mesh,
    )

    assert initialize_distributed(), "process group did not form"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2, jax.local_device_count()

    import jax.numpy as jnp

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.data import shard_for_rank
    from project_morpheus_tpu.training.pretrain import TrainConfig, train_loop

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)
    mesh = make_multihost_mesh(model=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2}

    # global batch of 4 examples, strided per rank like the reference's
    # AlternatingDistributedSampler (pretrain/train.py:76-84)
    global_examples = [
        {"input_ids": [(7 * i + j) % 900 + 3 for j in range(12)]}
        for i in range(4)
    ]
    local = shard_for_rank(
        global_examples, jax.process_index(), jax.process_count()
    )
    batches = [{"examples": local, "kind": "text"} for _ in range(3)]
    tc = TrainConfig(
        learning_rate=1e-3, warmup_steps=1, total_steps=3, seq_len=12,
        log_every=100,
    )
    _, history = train_loop(params, cfg, iter(batches), tc=tc, mesh=mesh)

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
