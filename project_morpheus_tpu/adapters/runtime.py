"""Shared serving runtime: model + engine + codec singletons.

The reference loads its GGUF model once behind an async lock
(llama_local.py:38-59); here the runtime owns the JAX params, the
continuous-batching engine, and the SNAC decoder, all built lazily from
env configuration:

- ``ORPHEUS_ENGINE_MODE``: ``jax`` (default) | ``mock`` — mock emits
  well-formed audio-band tokens without a model (the hermetic test/demo
  backend, mirroring SURVEY.md §4's fake-engine doctrine).
- ``ORPHEUS_MODEL_SIZE``: ``tiny`` | ``1b`` | ``3b`` (default tiny until a
  checkpoint is supplied).
- ``ORPHEUS_CHECKPOINT_PATH``: orbax checkpoint dir to restore params.
- ``ORPHEUS_SNAC_PATH``: ``.npz`` torch-layout SNAC state (weights.py
  conventions); unset -> random init.
- ``ORPHEUS_MAX_SLOTS`` / ``ORPHEUS_MAX_SEQ``: engine geometry.
"""
from __future__ import annotations

import asyncio
import os
from typing import Optional

import numpy as np

from ..model.config import LlamaConfig, ORPHEUS_SPECIAL_TOKENS
from ..model.sampling import SamplingParams

AUDIO_BASE = ORPHEUS_SPECIAL_TOKENS["audio_base"]
CODEBOOK = 4096
SAMPLE_RATE = 24_000


class MockEngine:
    """Engine stand-in emitting valid audio-band token ids.

    Deterministic per prompt; ~82 tokens/s of audio content with zero
    compute, so orchestrator/server behaviour is testable hermetically.
    """

    def __init__(self, tokens_per_request: int = 7 * 24) -> None:
        self.tokens_per_request = tokens_per_request

    async def submit(self, prompt_ids, sampling: Optional[SamplingParams] = None):
        from ..engine.request import Request, RequestState

        sampling = sampling or SamplingParams()
        req = Request(list(prompt_ids), sampling)
        req.state = RequestState.DECODING
        total = min(self.tokens_per_request, sampling.max_tokens)
        seed = (sum(prompt_ids) + len(prompt_ids)) % (2**31)
        rng = np.random.default_rng(seed)

        async def fill():
            for pos in range(total):
                code = int(rng.integers(0, CODEBOOK))
                req.token_queue.put_nowait(
                    AUDIO_BASE + code + (pos % 7) * CODEBOOK
                )
                if pos % 21 == 20:
                    await asyncio.sleep(0)  # yield to the loop
            req.state = RequestState.FINISHED
            req.token_queue.put_nowait(None)

        asyncio.get_event_loop().create_task(fill())
        return req

    def cancel(self, req) -> None:
        from ..engine.request import RequestState

        if not req.done:
            req.state = RequestState.CANCELLED
            req.token_queue.put_nowait(None)

    async def close(self) -> None:
        return None


class ServingRuntime:
    """Lazily constructed model/engine/codec bundle."""

    def __init__(self) -> None:
        self._lock = asyncio.Lock()
        self.engine = None
        self.snac_params = None
        self.snac_cfg = None
        self.model_cfg: Optional[LlamaConfig] = None

    @property
    def mode(self) -> str:
        return os.environ.get("ORPHEUS_ENGINE_MODE", "jax")

    async def ensure(self):
        async with self._lock:
            if self.engine is None:
                self._build()
            return self

    def _build(self) -> None:
        from ..codec import SNACConfig, init_snac_params
        from ..codec.weights import params_from_torch_state

        snac_path = os.environ.get("ORPHEUS_SNAC_PATH")
        size = os.environ.get("ORPHEUS_MODEL_SIZE", "tiny")
        if size == "tiny" and not snac_path:
            self.snac_cfg = SNACConfig.tiny()
            self.snac_params = init_snac_params(self.snac_cfg, seed=0)
        else:
            self.snac_cfg = SNACConfig.snac_24khz()
            if snac_path and os.path.exists(snac_path):
                state = dict(np.load(snac_path))
                self.snac_params = params_from_torch_state(state, self.snac_cfg)
            else:
                self.snac_params = init_snac_params(self.snac_cfg, seed=0)

        if self.mode == "mock":
            self.engine = MockEngine()
            return

        import jax
        import jax.numpy as jnp

        from ..engine import EngineConfig, OrpheusEngine
        from ..model import init_llama_params

        cfg = {
            "tiny": LlamaConfig.tiny,
            "1b": LlamaConfig.orpheus_1b,
            "3b": LlamaConfig.orpheus_3b,
        }[size]()
        self.model_cfg = cfg
        ckpt = os.environ.get("ORPHEUS_CHECKPOINT_PATH")
        if ckpt and os.path.isdir(ckpt):
            import pathlib

            d = pathlib.Path(ckpt)
            if any(d.glob("*.safetensors")) or any(d.glob("pytorch_model*.bin")):
                # an HF Orpheus release directory (what the reference's vLLM
                # path consumes, engine_class.py:60-67)
                from ..model.hf_weights import load_hf_checkpoint

                dtype = jnp.float32 if size == "tiny" else jnp.bfloat16
                params, cfg = load_hf_checkpoint(
                    ckpt,
                    None if (d / "config.json").exists() else cfg,
                    dtype=dtype,
                )
                self.model_cfg = cfg
            else:
                from ..training.checkpoint import restore_params

                # an orbax dir written by scripts/convert_checkpoint.py
                # carries its own architecture config
                cfg_json = d / "llama_config.json"
                if cfg_json.exists():
                    import json

                    cfg = LlamaConfig(**json.loads(cfg_json.read_text()))
                    self.model_cfg = cfg
                params = restore_params(ckpt, cfg)
        else:
            dtype = jnp.float32 if size == "tiny" else jnp.bfloat16
            params = init_llama_params(cfg, jax.random.key(0), dtype=dtype)
        if os.environ.get("ORPHEUS_QUANT", "").lower() == "int8":
            from ..model.quant import quantize_params_int8

            params = quantize_params_int8(params)
        # reference context default is n_ctx 8192 (llama_local.py:45-46);
        # tiny test configs stay small for hermetic speed
        default_seq = "2048" if size == "tiny" else "8192"
        # int8 KV cache halves decode HBM traffic at long context
        # (llama.init_kv_cache); bf16 remains the conservative default
        kv_dtype = os.environ.get("ORPHEUS_KV_QUANT", "bfloat16").lower()
        if kv_dtype in ("", "0", "off", "none"):
            kv_dtype = "bfloat16"
        ecfg = EngineConfig(
            max_slots=int(os.environ.get("ORPHEUS_MAX_SLOTS", "8")),
            max_seq_len=int(os.environ.get("ORPHEUS_MAX_SEQ", default_seq)),
            cache_dtype=kv_dtype,
        )
        self.engine = OrpheusEngine(
            params, cfg, ecfg, codec=(self.snac_params, self.snac_cfg)
        )

    async def reset(self) -> None:
        """Drop the runtime (config hot-swap path)."""
        async with self._lock:
            if self.engine is not None:
                await self.engine.close()
            self.engine = None


_runtime: Optional[ServingRuntime] = None


def get_runtime() -> ServingRuntime:
    global _runtime
    if _runtime is None:
        _runtime = ServingRuntime()
    return _runtime


def audio_code_from_token_id(token_id: int, audio_pos: int) -> Optional[int]:
    """Map a generated token id to a codebook entry, or None if non-audio.

    Token-id-space version of the reference string parser
    (speechpipe.py:146-189): ``code = id - 128266 - (pos%7)*4096``.
    """
    code = token_id - AUDIO_BASE - (audio_pos % 7) * CODEBOOK
    if 0 <= code < CODEBOOK:
        return code
    return None


def lenient_audio_code(token_id: int) -> Optional[int]:
    """Band-agnostic mapping: any audio-range id -> its in-band code.

    Bench/demo aid for random-weight models whose sampled audio ids land
    in arbitrary sub-bands; real checkpoints use the exact parser above.
    """
    off = token_id - AUDIO_BASE
    if 0 <= off < 7 * CODEBOOK:
        return off % CODEBOOK
    return None
