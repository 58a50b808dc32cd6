"""Orpheus decoder model: Llama-3.2-class transformer in functional JAX.

The reference runs this model through llama.cpp GGUF (serving,
Morpheus_Client/tts_engine/llama_local.py) or vLLM CUDA
(Orpheus-TTS/orpheus_tts_pypi/orpheus_tts/engine_class.py).  Here it is a
pure-JAX forward with:

- ``config``: Llama-3.2-3B + Orpheus vocab extension (+28,682 audio tokens,
  reference Orpheus-TTS/pretrain/train.py:173-176) and tiny test configs.
- ``llama``: RMSNorm / RoPE (llama3 scaling) / GQA / SwiGLU forward, usable
  for full-sequence training and single-token decode against a KV cache.
- ``sampling``: temperature / top-p / repetition-penalty sampling as a
  jit-safe function over the 156k-token vocab.
- ``tokenizer``: prompt formatting with the Orpheus special tokens and a
  hermetic byte-fallback tokenizer (real HF tokenizers load from a local
  path; no network is assumed).
"""

from .config import LlamaConfig, ORPHEUS_SPECIAL_TOKENS
from .llama import (
    init_llama_params,
    llama_forward,
    llama_decode_step,
    llama_prefill_chunk,
    llama_prefill_chunk_batch,
    init_kv_cache,
)
from .sampling import SamplingParams, sample_logits, init_sampler_state
from .tokenizer import ByteTokenizer, format_prompt_ids

__all__ = [
    "LlamaConfig",
    "ORPHEUS_SPECIAL_TOKENS",
    "init_llama_params",
    "llama_forward",
    "llama_decode_step",
    "llama_prefill_chunk",
    "llama_prefill_chunk_batch",
    "init_kv_cache",
    "SamplingParams",
    "sample_logits",
    "init_sampler_state",
    "ByteTokenizer",
    "format_prompt_ids",
]
