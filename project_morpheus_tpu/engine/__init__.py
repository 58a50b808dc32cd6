"""Device-resident continuous-batching decode engine.

The TPU replacement for the reference's per-request native generators
(llama.cpp `text_to_speech` generator, llama_local.py:62-87) and vLLM's
AsyncLLMEngine (engine_class.py:60-134): a slot table lives on device, one
jitted decode step advances every active request together, and the host
async loop handles admission, sampling state, stop detection and eviction
(eviction doubles as the barge-in path, reference core.py:118-125).
"""

from .engine import OrpheusEngine, EngineConfig
from .request import Request, RequestState

__all__ = ["OrpheusEngine", "EngineConfig", "Request", "RequestState"]
