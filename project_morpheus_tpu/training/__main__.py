"""Training CLI: ``python -m project_morpheus_tpu.training <cmd> --config cfg.yaml``.

YAML-config driven like the reference (pretrain/config.yaml,
finetune/config.yaml); data is JSONL of ``{"input_ids": [...]}`` records
(pre-tokenised, matching the reference's pre-tokenised HF datasets).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _load_yaml(path: str) -> dict:
    import yaml

    return yaml.safe_load(Path(path).read_text()) or {}


def _load_jsonl(path: str) -> list:
    return [json.loads(l) for l in Path(path).read_text().splitlines() if l.strip()]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="project_morpheus_tpu.training")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("pretrain", "finetune", "lora"):
        sp = sub.add_parser(name)
        sp.add_argument("--config", required=True)
    args = parser.parse_args(argv)
    cfg_dict = _load_yaml(args.config)

    import jax

    from ..parallel import initialize_distributed

    # multi-host entry: no-op unless JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID (or a Cloud TPU pod) configure a
    # process group — the reference's `accelerate launch` multinode
    # equivalent (pretrain/readme.md:23)
    initialize_distributed()

    import jax.numpy as jnp

    from ..model import LlamaConfig, init_llama_params
    from ..parallel import make_mesh, make_multihost_mesh
    from .pretrain import TrainConfig, train_loop
    from .data import BatchedRatioDataset, shard_for_rank

    size = cfg_dict.get("model_size", "tiny")
    model_cfg = {
        "tiny": LlamaConfig.tiny,
        "tiny_vocab": LlamaConfig.tiny_vocab,
        "1b": LlamaConfig.orpheus_1b,
        "3b": LlamaConfig.orpheus_3b,
    }[size]()
    tc = TrainConfig(
        learning_rate=float(cfg_dict.get("learning_rate", 5e-5)),
        warmup_steps=int(cfg_dict.get("warmup_steps", 100)),
        total_steps=int(cfg_dict.get("epochs_steps", cfg_dict.get("total_steps", 1000))),
        seq_len=int(cfg_dict.get("seq_length", 8192)),
        save_steps=int(cfg_dict.get("save_steps", 5000)),
    )
    ckpt_path = cfg_dict.get("checkpoint_dir")
    resume = cfg_dict.get("resume_from")
    if resume:
        from .checkpoint import restore_params

        params = restore_params(resume)
    else:
        params = init_llama_params(
            model_cfg, jax.random.key(int(cfg_dict.get("seed", 0))),
            dtype=jnp.bfloat16 if cfg_dict.get("bf16", True) else jnp.float32,
        )
    tp = int(cfg_dict.get("tensor_parallel", 1))
    if jax.process_count() > 1:
        mesh = make_multihost_mesh(model=tp)
    else:
        mesh = make_mesh(model=tp)

    def log(rec):
        # rank-0 logging, like the reference's rank0 wandb stream
        if jax.process_index() == 0:
            print(json.dumps(rec), flush=True)

    batch_size = int(cfg_dict.get("batch_size", 1))
    if args.cmd == "pretrain":
        text = _load_jsonl(cfg_dict["text_data"])
        audio = _load_jsonl(cfg_dict["audio_data"])
        if jax.process_count() > 1:
            # per-process strided shard (the reference's
            # AlternatingDistributedSampler, pretrain/train.py:76-84);
            # batch_size is PER HOST — global batch = hosts x batch_size
            text = shard_for_rank(text, jax.process_index(), jax.process_count())
            audio = shard_for_rank(audio, jax.process_index(), jax.process_count())
        ds = BatchedRatioDataset(
            text, audio, batch_size, ratio=int(cfg_dict.get("ratio", 1))
        )
        train_loop(params, model_cfg, iter(ds), tc=tc, mesh=mesh, log=log,
                   checkpoint_dir=ckpt_path)
    elif args.cmd == "finetune":
        from .finetune import finetune

        data = _load_jsonl(cfg_dict["data"])
        finetune(params, model_cfg, data, batch_size=batch_size, tc=tc,
                 mesh=mesh, log=log, checkpoint_dir=ckpt_path)
    else:  # lora
        import optax

        from .data import pad_collate
        from .lora import LoraConfig, init_lora_params, make_lora_train_step, merge_lora
        from .pretrain import make_optimizer

        lc = LoraConfig(
            rank=int(cfg_dict.get("lora_rank", 32)),
            alpha=float(cfg_dict.get("lora_alpha", 64)),
        )
        lora = init_lora_params(model_cfg, lc, jax.random.key(1))
        opt = make_optimizer(tc)
        step = make_lora_train_step(model_cfg, lc, opt)
        opt_state = opt.init(lora)
        data = _load_jsonl(cfg_dict["data"])
        for i in range(tc.total_steps):
            batch_ex = data[(i * batch_size) % max(1, len(data) - batch_size):][:batch_size]
            if not batch_ex:
                break
            batch = {
                k: jnp.asarray(v)
                for k, v in pad_collate(batch_ex, max_len=tc.seq_len).items()
            }
            lora, opt_state, loss = step(lora, opt_state, params, batch)
            if i % tc.log_every == 0:
                log({"step": i, "lora_loss": float(loss)})
        if ckpt_path:
            from .checkpoint import save_params

            merged = merge_lora(params, lora, lc)
            save_params(ckpt_path, merged, step=tc.total_steps)
            log({"saved_merged": ckpt_path})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
