"""SNAC codec: audio-token frames -> 24 kHz PCM, TPU-native.

The Orpheus data model (reference: Morpheus_Client/tts_engine/speechpipe.py)
emits 7 audio tokens per codec frame, interleaving three SNAC codebook
levels.  This package implements:

- ``frames``: pure token-id <-> codebook-grid math (jit-safe, id-native —
  no string round-trips on the hot path, unlike the reference).
- ``snac_config`` / ``snac_jax``: the SNAC hierarchical decoder
  (RVQ embed -> depthwise conv stack -> transposed-conv upsampling ->
  tanh waveform) as a functional JAX model.
- ``weights``: random init + torch-checkpoint conversion (weight-norm
  folding) so real `snac_24khz` weights can be dropped in.
- ``streaming``: the fixed-latency sliding-window hop decoder that
  reproduces the reference's 49/28/7-token window and 2048-sample hop
  contract (adapter-level use; parity mode is the golden-trace oracle).
- ``stream_decode``: the stateful O(1)-context streaming decoder the
  serving engine uses — cached per-layer activation tails, 4-frame hop
  windows, exact prefix-decode output, batched lanes with commit masks.
"""

from .snac_config import SNACConfig
from .frames import (
    FRAME_TOKENS,
    tokens_to_codes,
    codes_to_tokens,
    audio_code_from_custom_number,
    parse_custom_token,
)
from .snac_jax import snac_decode, snac_encode
from .weights import init_snac_params
from .streaming import StreamingSnacDecoder, HOP_SAMPLES
from .stream_decode import (
    ExactStreamDecoder,
    StreamPlanner,
    init_stream_state,
    make_stream_decoder,
    reset_lanes,
    snac_stream_step,
)

__all__ = [
    "ExactStreamDecoder",
    "make_stream_decoder",
    "StreamPlanner",
    "init_stream_state",
    "reset_lanes",
    "snac_stream_step",
    "SNACConfig",
    "FRAME_TOKENS",
    "tokens_to_codes",
    "codes_to_tokens",
    "audio_code_from_custom_number",
    "parse_custom_token",
    "snac_decode",
    "snac_encode",
    "init_snac_params",
    "StreamingSnacDecoder",
    "HOP_SAMPLES",
]
