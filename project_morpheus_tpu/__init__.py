"""project_morpheus_tpu — a TPU-native streaming TTS framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
DocWobble/Project_Morpheus (Orpheus streaming TTS): a Llama-3B-class
audio-token decoder driven by a continuous-batching device-resident engine,
a SNAC hierarchical codec decoder emitting 24 kHz PCM in fixed-latency hops,
and a pull-based host orchestrator (adaptive chunk ladder, barge-in,
crossfade stitching) on top, exposed through an OpenAI-style streaming
speech API.

Layer map (TPU edition; cf. reference SURVEY.md §1):

    server/        ASGI REST + WS API, admin UI, client SDK
    text_sources/  push-mode text ingestion (websocket, http poll, cli pipe)
    orchestrator/  pull loop, chunk ladder, playback/ring buffers, stitcher
    adapters/      TTSAdapter registry + local-JAX / remote-HTTP backends
    engine/        continuous-batching decode engine (slot table, KV cache)
    model/         Llama-3.2-class decoder, sampling, KV cache (JAX)
    codec/         SNAC token->PCM decoder (JAX + Pallas)
    ops/           Pallas TPU kernels (attention, codec convs)
    parallel/      mesh / sharding / collectives (pjit, NamedSharding)
    training/      pretrain (interleaved text+TTS), finetune, LoRA
    utils/         perf monitor, replay, watermark
"""

__version__ = "0.1.0"
