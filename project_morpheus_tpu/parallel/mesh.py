"""Mesh construction over TPU slices.

Axis convention: ``("data", "model")`` — DP/FSDP over ``data`` (DCN-friendly
between hosts), TP over ``model`` (must stay intra-slice so Megatron
collectives ride ICI).  ``make_mesh`` lays devices out so the model axis is
contiguous in the physical order jax.devices() reports.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


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
