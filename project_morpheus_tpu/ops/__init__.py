"""Pallas TPU kernels for the hot paths.

- ``decode_attention``: length-aware flash decode attention over the slot
  KV cache — the TPU-native replacement for the reference's native
  attention engines (llama.cpp GGML / vLLM PagedAttention, SURVEY.md §2.3).
- ``flash_attention``: blockwise causal flash attention for training
  (replaces flash-attn 2, reference pretrain/train.py:170).
"""

from .decode_attention import decode_attention, decode_attention_reference

__all__ = ["decode_attention", "decode_attention_reference"]
