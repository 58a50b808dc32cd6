"""NamedShardings for the Llama parameter/state pytrees.

Two modes:

- ``tp``: Megatron tensor parallelism over the ``model`` axis — q/k/v and
  gate/up projections column-sharded, o and down projections row-sharded,
  embedding/lm_head sharded on the (padded) vocab dimension so the logits
  matmul is local and XLA all-gathers only at sampling.
- ``fsdp``: ZeRO-3-style — every parameter sharded on its largest dimension
  over the ``data`` axis; XLA materialises full layers on demand
  (all-gather) and reduce-scatters gradients.  This is the pjit equivalent
  of the reference's ``fsdp="auto_wrap"`` (pretrain/train.py:195).

Serving state: KV cache and per-slot vectors shard slots over ``data`` and
kv-heads over ``model``.
"""
from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model.config import LlamaConfig


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def param_shardings(cfg: LlamaConfig, mesh: Mesh, mode: str = "tp") -> Dict:
    """Sharding pytree matching ``init_llama_params`` structure.

    Layer-stacked weights carry a leading layer axis that is never sharded.
    """
    if mode == "tp":
        layers = {
            "ln1": _ns(mesh, None, None),
            "wq": _ns(mesh, None, None, "model"),
            "wk": _ns(mesh, None, None, "model"),
            "wv": _ns(mesh, None, None, "model"),
            "wo": _ns(mesh, None, "model", None),
            "ln2": _ns(mesh, None, None),
            "wg": _ns(mesh, None, None, "model"),
            "wu": _ns(mesh, None, None, "model"),
            "wd": _ns(mesh, None, "model", None),
        }
        out = {
            "embed": _ns(mesh, "model", None),  # vocab-sharded
            "layers": layers,
            "ln_f": _ns(mesh, None),
        }
        if not cfg.tie_embeddings:
            out["lm_head"] = _ns(mesh, None, "model")
        return out
    if mode == "fsdp":
        layers = {
            "ln1": _ns(mesh, None, "data"),
            "wq": _ns(mesh, None, "data", None),
            "wk": _ns(mesh, None, "data", None),
            "wv": _ns(mesh, None, "data", None),
            "wo": _ns(mesh, None, "data", None),
            "ln2": _ns(mesh, None, "data"),
            "wg": _ns(mesh, None, "data", None),
            "wu": _ns(mesh, None, "data", None),
            "wd": _ns(mesh, None, "data", None),
        }
        out = {
            "embed": _ns(mesh, "data", None),
            "layers": layers,
            "ln_f": _ns(mesh, "data"),
        }
        if not cfg.tie_embeddings:
            out["lm_head"] = _ns(mesh, "data", None)
        return out
    if mode == "fsdp_tp":
        # 2-D sharding: hidden dim over data (ZeRO-3) and head/ffn dim over
        # model (Megatron) simultaneously — the training layout for multi-
        # host slices (data axis on DCN, model axis on ICI).
        layers = {
            "ln1": _ns(mesh, None, None),
            "wq": _ns(mesh, None, "data", "model"),
            "wk": _ns(mesh, None, "data", "model"),
            "wv": _ns(mesh, None, "data", "model"),
            "wo": _ns(mesh, None, "model", "data"),
            "ln2": _ns(mesh, None, None),
            "wg": _ns(mesh, None, "data", "model"),
            "wu": _ns(mesh, None, "data", "model"),
            "wd": _ns(mesh, None, "model", "data"),
        }
        out = {
            "embed": _ns(mesh, "model", "data"),
            "layers": layers,
            "ln_f": _ns(mesh, None),
        }
        if not cfg.tie_embeddings:
            out["lm_head"] = _ns(mesh, "data", "model")
        return out
    if mode == "replicated":
        tree = {
            "embed": 0,
            "layers": {
                k: 0
                for k in ("ln1", "wq", "wk", "wv", "wo", "ln2", "wg", "wu", "wd")
            },
            "ln_f": 0,
        }
        if not cfg.tie_embeddings:
            tree["lm_head"] = 0
        return jax.tree.map(lambda _: _ns(mesh), tree)
    raise ValueError(f"unknown sharding mode {mode!r}")


def shardings_like(params: Dict, shardings: Dict) -> Dict:
    """Adapt a ``param_shardings`` pytree to the actual params structure.

    Handles two serving-time divergences from the canonical layout:
    - fused projection leaves (``wqkv``/``wgu``, quant.fuse_layer_weights):
      inherit wq's / wg's spec (identical axis meaning when the out axis is
      unsharded — TP never fuses);
    - int8-quantized leaves ``{"q", "scale"}``: the int8 tensor takes the
      weight spec; the per-output-column scale takes the spec minus the
      contraction axis.
    """
    from ..model.quant import is_quantized

    def scale_spec(ns: NamedSharding, qshape, sshape) -> NamedSharding:
        # the scale's dims correspond (in order) to a subset of q's dims —
        # per-output-column for layer weights ((L, in, out) -> (L, out)),
        # per-row for the embedding ((V, D) -> (V,)); match greedily by size
        spec = list(ns.spec) + [None] * (len(qshape) - len(ns.spec))
        kept = [None] * len(sshape)
        i = len(qshape) - 1
        for j in reversed(range(len(sshape))):
            while i >= 0 and qshape[i] != sshape[j]:
                i -= 1
            if i < 0:  # no alignment found: replicate the scale (it's tiny)
                return NamedSharding(ns.mesh, P(*([None] * len(sshape))))
            kept[j] = spec[i]
            i -= 1
        return NamedSharding(ns.mesh, P(*kept))

    def adapt(p, s):
        if is_quantized(p):
            return {
                "q": s,
                "scale": scale_spec(s, p["q"].shape, p["scale"].shape),
            }
        return s

    out: Dict = {}
    for key, val in params.items():
        if key == "layers":
            lsh = shardings["layers"]
            out["layers"] = {}
            for k, v in val.items():
                base = lsh.get(k) or lsh.get(
                    {"wqkv": "wq", "wgu": "wg"}.get(k, k)
                )
                out["layers"][k] = adapt(v, base)
        else:
            out[key] = adapt(val, shardings[key])
    return out


def kv_cache_shardings(mesh: Mesh, quantized: bool = False) -> Dict:
    """bf16 cache (L, slots, KV, S, HD): slots over data, kv heads over
    model.  The quantized cache is position-major (L, slots, S, KV, HD)
    with a combined (L, slots, S, 2*KV) scale array (init_kv_cache layout
    note): payload kv heads shard over model on dim 3; the scale lanes
    interleave k|v halves, so they stay replicated across model (tiny
    next to the payload, and the score/prob multiplies slice them
    locally without communication).
    """
    if quantized:
        # flat (L, slots, S, KV*HD) payload: the head-x-dim minor axis
        # shards over model at kv-head boundaries (model | KV)
        return {
            "k": _ns(mesh, None, "data", None, "model"),
            "v": _ns(mesh, None, "data", None, "model"),
            "scale": _ns(mesh, None, "data", None, None),
        }
    return {
        "k": _ns(mesh, None, "data", "model", None, None),
        "v": _ns(mesh, None, "data", "model", None, None),
    }


def engine_state_shardings(mesh: Mesh, quantized_cache: bool = False,
                           audio_ring: bool = False) -> Dict:
    """Full engine dstate pytree shardings (see OrpheusEngine.dstate)."""
    slot = _ns(mesh, "data")
    out = {
        "cache": kv_cache_shardings(mesh, quantized_cache),
        "lengths": slot,
        "active": slot,
        "remaining": slot,
        "is_audio": slot,
        "custom_stops": _ns(mesh, "data", None),
        "rng": slot,
        "last_tokens": slot,
        "presence": _ns(mesh, "data", None),
        "temp": slot,
        "top_p": slot,
        "rep_pen": slot,
    }
    if audio_ring:  # fused-codec engines: slot-sharded ring state
        out.update({
            "ring": _ns(mesh, "data", None),
            "partial": _ns(mesh, "data", None),
            "pcnt": slot,
            "fcnt": slot,
            "audio_pos": slot,
            "frame_done": slot,
        })
    return out


def batch_shardings(mesh: Mesh) -> NamedSharding:
    """Training batches: (B, S) sharded over data."""
    return _ns(mesh, "data", None)
