"""Mesh construction over TPU slices.

Axis convention: ``("data", "model")`` — DP/FSDP over ``data`` (DCN-friendly
between hosts), TP over ``model`` (must stay intra-slice so Megatron
collectives ride ICI).  ``make_mesh`` lays devices out so the model axis is
contiguous in the physical order jax.devices() reports.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bring up the JAX process group for multi-host training.

    The reference trains multinode via accelerate + FSDP/NCCL
    (Orpheus-TTS/pretrain/readme.md:23); the TPU-native equivalent is
    ``jax.distributed.initialize``, after which ``jax.devices()`` is
    GLOBAL: pjit collectives ride ICI intra-slice and DCN across hosts.

    Configuration precedence: explicit args > env
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``) > Cloud-TPU pod auto-detection.  A single process
    with none of these configured is a no-op.  Returns True when a
    multi-process group is live.

    Launch recipe (one command per host)::

        JAX_COORDINATOR_ADDRESS=host0:8476 JAX_NUM_PROCESSES=4 \\
        JAX_PROCESS_ID=$RANK python -m project_morpheus_tpu.training \\
            pretrain --config cfg.yaml
    """
    # IMPORTANT: decide from env/args BEFORE touching any jax API that
    # initialises the XLA backend (process_count/devices/...): calling
    # jax.distributed.initialize after backend init raises.  Found by the
    # 2-process exercise in tests/test_multiprocess.py.
    env = os.environ
    if coordinator_address is None:
        coordinator_address = env.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # Cloud TPU pod auto-detection: only when the worker list names
        # MORE than one host (single-host plugins may set the var too)
        hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
        if "," in hostnames or env.get("MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            return jax.process_count() > 1
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # idempotence: a live group (initialize called twice) is fine; a
        # backend initialised before this call is a real ordering bug
        if jax.process_count() <= 1:
            raise RuntimeError(
                "jax backend was initialised before initialize_distributed; "
                "call it first thing in the entry point"
            ) from e
    return jax.process_count() > 1


def make_multihost_mesh(model: int = 1, data: Optional[int] = None) -> Mesh:
    """(data, model) mesh over every process's devices.

    ``mesh_utils.create_device_mesh`` lays the model axis over physically
    adjacent devices (ICI) and lets the data axis span hosts (DCN) — the
    FSDP/DP-outer, TP-inner layout SURVEY.md §2.4 calls for.  TP degree
    must divide the per-host device count so Megatron collectives never
    cross DCN.
    """
    from jax.experimental import mesh_utils

    n = jax.device_count()
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    if model > jax.local_device_count():
        raise ValueError(
            f"tp={model} exceeds per-host device count "
            f"{jax.local_device_count()}; the model axis must stay on ICI"
        )
    devices = mesh_utils.create_device_mesh((data, model))
    return Mesh(devices, axis_names=("data", "model"))


def mesh_shape_for(
    n_devices: int, tp: Optional[int] = None
) -> Tuple[int, int]:
    """Pick (data, model) given a device count and optional TP degree."""
    if tp is None:
        tp = 1
    if n_devices % tp != 0:
        raise ValueError(f"tp={tp} does not divide device count {n_devices}")
    return n_devices // tp, tp


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} != {len(devices)} devices"
        )
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))
