"""TTS adapter registry and backends (reference L3, tts_engine/).

Adapters satisfy the orchestrator's pull protocol; the registry maps names
to constructors with capability descriptors and voice-schema mappers
(reference tts_engine/adapter_registry.py).  Bundled backends:

- ``local_jax``: the in-process TPU engine (continuous batching + SNAC)
- ``remote_sse``: OpenAI-compatible SSE token streaming + local SNAC decode
"""

from .registry import AdapterRegistry, VoiceSchema, registry

__all__ = ["AdapterRegistry", "VoiceSchema", "registry"]
