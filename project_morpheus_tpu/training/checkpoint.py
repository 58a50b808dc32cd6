"""Sharded checkpointing via orbax (SURVEY.md §5.4 TPU equivalent).

The reference consolidates FSDP shards into a rank0 FULL_STATE_DICT with
CPU offload (pretrain/train.py:128-137); on TPU the idiomatic form is an
orbax sharded save where every host writes its shards and restore maps
directly into the target sharding — no consolidation step, no host OOM.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..model.config import LlamaConfig


def _ckpt_path(directory, step: Optional[int]) -> Path:
    p = Path(directory).absolute()
    return p / (f"step_{step}" if step is not None else "latest")


def save_params(directory, params, step: Optional[int] = None) -> str:
    path = _ckpt_path(directory, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)
    return str(path)


def restore_params(
    directory,
    cfg: Optional[LlamaConfig] = None,
    step: Optional[int] = None,
    target=None,
    shardings=None,
):
    """Restore a params pytree.

    ``target`` (an abstract pytree / example) guides dtypes+shapes; when
    ``shardings`` is given, arrays restore directly into that placement
    (restore-into-sharding, no replication spike).
    """
    base = Path(directory).absolute()
    path = _ckpt_path(directory, step)
    if not path.exists():
        # fall back to newest step dir
        steps = sorted(
            (d for d in base.iterdir() if d.name.startswith("step_")),
            key=lambda d: int(d.name.split("_")[1]),
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoint under {base}")
        path = steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        if target is None and cfg is not None and shardings is not None:
            # only synthesise a target when a sharded restore is requested;
            # otherwise restore with the checkpoint's own dtypes verbatim
            from ..model.llama import init_llama_params

            target = jax.eval_shape(
                lambda: init_llama_params(cfg, jax.random.key(0))
            )
        if target is not None and shardings is not None:
            target = jax.tree.map(
                lambda t, s: jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=s),
                target,
                shardings,
            )
        return ckptr.restore(path, target)
