"""HF Llama checkpoint -> JAX parameter pytree converter.

A reference user points the stack at an Orpheus checkpoint on the hub
(e.g. ``canopylabs/orpheus-3b-0.1-ft`` via vLLM, engine_class.py:60-67, or
a GGUF export via llama.cpp, llama_local.py:38-52).  The TPU-native
equivalent consumes the same HF layout directly: safetensors (preferred)
or torch ``pytorch_model.bin`` shards from a local directory, mapped into
the layer-stacked pytree ``init_llama_params`` defines.

Conventions verified against the torch implementation (tests/test_hf_weights.py
compares logits against ``transformers.LlamaForCausalLM`` on a tiny config):
- HF Linear weights are ``(out, in)`` -> transposed to ``(in, out)``;
- rotary embedding uses the rotate-half convention (matches ``apply_rope``);
- q/k/v keep HF head order; GQA grouping q[h*G:(h+1)*G] <-> kv[h] matches
  ``_project_qkv``'s reshape;
- vocab rows are zero-padded up to ``cfg.padded_vocab``.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import re
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import LlamaConfig

logger = logging.getLogger(__name__)

__all__ = ["load_hf_checkpoint", "hf_state_dict_to_params", "config_from_hf"]


def config_from_hf(hf_config: Dict) -> LlamaConfig:
    """Build a LlamaConfig from an HF ``config.json`` dict.

    ``tie_word_embeddings`` defaults to False when absent — matching HF's
    ``LlamaConfig`` default; ``load_hf_checkpoint`` additionally infers the
    true value from the state dict when the key is omitted.
    """
    rope = hf_config.get("rope_scaling") or {}
    if rope:
        rtype = rope.get("rope_type") or rope.get("type")
        if rtype != "llama3":
            raise ValueError(
                f"unsupported rope_scaling type {rtype!r}; only 'llama3' "
                "(low/high freq factor) scaling is implemented"
            )
    head_dim = hf_config.get("head_dim") or (
        hf_config["hidden_size"] // hf_config["num_attention_heads"]
    )
    return LlamaConfig(
        vocab_size=hf_config["vocab_size"],
        hidden_size=hf_config["hidden_size"],
        intermediate_size=hf_config["intermediate_size"],
        num_layers=hf_config["num_hidden_layers"],
        num_heads=hf_config["num_attention_heads"],
        num_kv_heads=hf_config.get(
            "num_key_value_heads", hf_config["num_attention_heads"]
        ),
        head_dim=head_dim,
        max_seq_len=hf_config.get("max_position_embeddings", 8192),
        rope_theta=float(hf_config.get("rope_theta", 500_000.0)),
        rope_scaling_factor=float(rope.get("factor", 1.0)),
        rope_low_freq_factor=float(rope.get("low_freq_factor", 1.0)),
        rope_high_freq_factor=float(rope.get("high_freq_factor", 4.0)),
        rope_original_max_pos=int(
            rope.get("original_max_position_embeddings", 8192)
        ),
        rms_eps=float(hf_config.get("rms_norm_eps", 1e-5)),
        tie_embeddings=bool(hf_config.get("tie_word_embeddings", False)),
    )


def _iter_hf_tensors(directory: Path) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (name, array) from safetensors shards or torch .bin shards."""
    st_files = sorted(directory.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(str(f), framework="numpy") as sf:
                for name in sf.keys():
                    yield name, sf.get_tensor(name)
        return
    bin_files = sorted(directory.glob("pytorch_model*.bin")) or sorted(
        directory.glob("*.pt")
    )
    if not bin_files:
        raise FileNotFoundError(
            f"no *.safetensors or pytorch_model*.bin under {directory}"
        )
    import torch

    for f in bin_files:
        sd = torch.load(str(f), map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.float().numpy()


_LAYER_RE = re.compile(r"model\.layers\.(\d+)\.(.+)")

_LAYER_KEY_MAP = {
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.o_proj.weight": ("wo", True),
    "mlp.gate_proj.weight": ("wg", True),
    "mlp.up_proj.weight": ("wu", True),
    "mlp.down_proj.weight": ("wd", True),
    "input_layernorm.weight": ("ln1", False),
    "post_attention_layernorm.weight": ("ln2", False),
}


def hf_state_dict_to_params(
    state: Dict[str, np.ndarray], cfg: LlamaConfig, dtype=jnp.bfloat16
) -> Dict:
    """Convert a flat HF Llama state dict (numpy values) to our pytree."""
    L = cfg.num_layers
    staged: Dict[str, list] = {k: [None] * L for k, _ in _LAYER_KEY_MAP.values()}
    embed = None
    lm_head = None
    ln_f = None
    for name, arr in state.items():
        if name in ("model.embed_tokens.weight", "transformer.wte.weight"):
            embed = arr
            continue
        if name == "lm_head.weight":
            lm_head = arr
            continue
        if name == "model.norm.weight":
            ln_f = arr
            continue
        m = _LAYER_RE.match(name)
        if not m:
            continue  # rotary inv_freq buffers etc.
        idx, rest = int(m.group(1)), m.group(2)
        entry = _LAYER_KEY_MAP.get(rest)
        if entry is None:
            continue
        key, transpose = entry
        staged[key][idx] = arr.T if transpose else arr

    if embed is None or ln_f is None:
        raise ValueError("state dict missing embed_tokens / model.norm")
    if not cfg.tie_embeddings and lm_head is None:
        raise ValueError(
            "config says untied embeddings (tie_word_embeddings=False) but "
            "the checkpoint has no lm_head.weight; pass a cfg with "
            "tie_embeddings=True or use load_hf_checkpoint (which infers)"
        )
    for key, rows in staged.items():
        missing = [i for i, r in enumerate(rows) if r is None]
        if missing:
            raise ValueError(f"layers missing for {key}: {missing[:4]}...")

    Vp = cfg.padded_vocab

    def pad_vocab(a: np.ndarray) -> np.ndarray:
        if a.shape[0] == Vp:
            return a
        if a.shape[0] > Vp:
            raise ValueError(
                f"checkpoint vocab {a.shape[0]} exceeds padded vocab {Vp}"
            )
        out = np.zeros((Vp,) + a.shape[1:], a.dtype)
        out[: a.shape[0]] = a
        return out

    params = {
        "embed": jnp.asarray(pad_vocab(embed), dtype),
        "layers": {
            key: jnp.asarray(np.stack(rows), dtype)
            for key, rows in staged.items()
        },
        "ln_f": jnp.asarray(ln_f, dtype),
    }
    if lm_head is not None and not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(pad_vocab(lm_head).T, dtype)
    return params


def load_hf_checkpoint(
    directory: str,
    cfg: Optional[LlamaConfig] = None,
    dtype=jnp.bfloat16,
) -> Tuple[Dict, LlamaConfig]:
    """Load an HF Llama/Orpheus checkpoint directory into (params, cfg)."""
    d = Path(os.path.expanduser(directory))
    hf_cfg: Optional[Dict] = None
    if cfg is None:
        cfg_path = d / "config.json"
        if not cfg_path.exists():
            raise FileNotFoundError(f"{cfg_path} not found; pass cfg explicitly")
        hf_cfg = json.loads(cfg_path.read_text())
        cfg = config_from_hf(hf_cfg)
    state = dict(_iter_hf_tensors(d))
    if hf_cfg is not None:
        # When config.json omits tie_word_embeddings, trust the state dict:
        # an untied checkpoint ships lm_head.weight, a tied one doesn't.
        # A silently-dropped lm_head produces garbage logits with no error.
        tied_in_state = "lm_head.weight" not in state
        if "tie_word_embeddings" not in hf_cfg:
            if tied_in_state != cfg.tie_embeddings:
                cfg = dataclasses.replace(cfg, tie_embeddings=tied_in_state)
        elif cfg.tie_embeddings != tied_in_state and not cfg.tie_embeddings:
            logger.warning(
                "config.json declares untied embeddings but the checkpoint "
                "has no lm_head.weight; falling back to tied"
            )
            cfg = dataclasses.replace(cfg, tie_embeddings=True)
    return hf_state_dict_to_params(state, cfg, dtype), cfg
