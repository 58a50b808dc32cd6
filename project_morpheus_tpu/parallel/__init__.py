"""Device mesh, shardings and collectives (SURVEY.md §2.4 TPU mapping).

The reference's parallelism inventory maps to JAX as:

- FSDP/NCCL data-parallel training (pretrain/train.py:195)
  -> parameters sharded over the ``data`` axis (ZeRO-3 style) with XLA
  inserting all-gather/reduce-scatter over ICI.
- vLLM tensor-parallel pass-through (engine_class.py:61-66)
  -> Megatron-style NamedShardings over the ``model`` axis for the decoder.
- Request-level serving concurrency -> slot batch sharded over ``data``.

PP/EP/ring-attention are explicit non-goals, matching the reference.
"""

from .mesh import (
    initialize_distributed,
    make_mesh,
    make_multihost_mesh,
    mesh_shape_for,
)
from .sharding import (
    param_shardings,
    kv_cache_shardings,
    engine_state_shardings,
    batch_shardings,
    shardings_like,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "make_multihost_mesh",
    "mesh_shape_for",
    "param_shardings",
    "kv_cache_shardings",
    "engine_state_shardings",
    "batch_shardings",
    "shardings_like",
]
