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


def latest_step(directory) -> Optional[int]:
    """Highest step number checkpointed under ``directory`` (None if none)."""
    base = Path(directory).absolute()
    if not base.exists():
        return None
    steps = [
        int(d.name.split("_")[1])
        for d in base.iterdir()
        if d.name.startswith("step_") and d.name.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def save_train_state(directory, params, opt_state, step: int) -> str:
    """Save the full trainer state: params + optimizer state + step.

    The reference's unit of restart is a consolidated trainer checkpoint
    (pretrain/train.py:128-137); here every host writes its own shards
    and the step counter rides along so a killed run resumes exactly.
    """
    path = _ckpt_path(directory, step)
    state = {
        "params": params,
        "opt_state": opt_state,
        "step": np.asarray(step, np.int64),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return str(path)


def restore_train_state(directory, target, step: Optional[int] = None, mesh=None):
    """Restore ``{"params", "opt_state", "step"}`` into ``target``'s
    structure/shardings (pass concrete arrays or ShapeDtypeStructs).

    When ``mesh`` is given, leaves without a NamedSharding (optimizer
    scalars like the schedule ``count``, the step counter) restore
    REPLICATED over it — a committed single-device scalar would otherwise
    clash with mesh-sharded params inside the jitted train step.
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
    path = _ckpt_path(directory, step)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())

        def as_struct(x):
            sh = getattr(x, "sharding", None)
            if not isinstance(sh, NamedSharding):
                sh = rep
            return jax.ShapeDtypeStruct(
                np.shape(x), np.asarray(x).dtype if not hasattr(x, "dtype") else x.dtype,
                sharding=sh,
            )

        target = jax.tree.map(as_struct, target)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


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
