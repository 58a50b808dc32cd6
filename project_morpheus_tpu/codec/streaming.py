"""Fixed-latency streaming SNAC decode (the token->PCM hop pipeline).

Reference semantics (Morpheus_Client/tts_engine/speechpipe.py:191-293):
tokens arrive one at a time; the first audio is attempted after 7 tokens
(1 frame), then one hop per 7 tokens using a sliding window of the last 49
tokens (ideal) or 28 (min), always emitting waveform slice ``[2048:4096]``
of the decoded window — one 2048-sample frame (85.3 ms @ 24 kHz) per hop.

Two modes:

- ``mode="parity"`` reproduces the reference exactly, including its quirks:
  the 7-token first window decodes to 2048 samples so the ``[2048:4096]``
  slice is *empty* (the reference's "ultra-low-latency first chunk" is zero
  bytes), and when the buffer first reaches 49 tokens the emitted window
  position rewinds by two frames (duplicated audio).  Kept for golden-trace
  compatibility against the reference pipeline.

- ``mode="native"`` (default) is the TPU-first design: a **single static
  window shape** (7 frames, edge-replicated at stream head/tail) so exactly
  one XLA program is compiled; each hop emits the next unemitted frame with
  ``lookahead`` frames of real right-context.  The first frame is emitted
  immediately after 7 tokens (real audio, not empty), matching the
  reference's latency intent without its discontinuities.

The decode window is recomputed per hop (like the reference).  The serving
engine instead uses ``stream_decode`` (cached conv tails, 4-frame hops,
exact prefix-decode output); this module remains the adapter-level decoder
and the parity oracle for golden traces.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .frames import FRAME_TOKENS, tokens_to_codes
from .snac_config import SNACConfig
from .snac_jax import snac_decode

HOP_SAMPLES = 2048  # samples emitted per 7-token hop (snac_24khz)


def _to_int16(audio: jnp.ndarray) -> jnp.ndarray:
    # Reference scales by 32767 then truncates (speechpipe.py:127).
    return (audio * 32767.0).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames", "emit_lo", "emit_hi"))
def _decode_window_slice(
    params,
    tokens: jnp.ndarray,  # (n_frames * 7,) int32 codebook entries
    *,
    cfg: SNACConfig,
    n_frames: int,
    emit_lo: int,
    emit_hi: int,
) -> jnp.ndarray:
    c0, c1, c2 = tokens_to_codes(tokens[None, :])
    audio = snac_decode(params, (c0, c1, c2), cfg, noise_rng=None)
    return _to_int16(audio[0, emit_lo:emit_hi])


@functools.partial(jax.jit, static_argnames=("cfg", "emit_lo", "emit_hi"))
def decode_windows_batched(
    params,
    windows: jnp.ndarray,  # (B, n_frames * 7) int32 codebook entries
    *,
    cfg: SNACConfig,
    emit_lo: int,
    emit_hi: int,
) -> jnp.ndarray:
    """Decode many streams' windows in ONE dispatch -> (B, hop) int16.

    The serving engine advances all slots one frame per sync; batching the
    hop decode across slots amortises dispatch overhead and fills the MXU.
    """
    c0, c1, c2 = tokens_to_codes(windows)
    audio = snac_decode(params, (c0, c1, c2), cfg, noise_rng=None)
    return _to_int16(audio[:, emit_lo:emit_hi])


class StreamingSnacDecoder:
    """Push audio codes in, get fixed-size PCM16 hops out."""

    def __init__(
        self,
        params,
        cfg: Optional[SNACConfig] = None,
        *,
        mode: str = "native",
        lookahead_frames: int = 2,
        window_frames: int = 7,
    ) -> None:
        assert mode in ("native", "parity")
        import jax

        # ensure device residency: host-numpy leaves would be re-shipped on
        # every hop (catastrophic over a tunnelled backend)
        self.params = jax.device_put(params)
        self.cfg = cfg or SNACConfig.snac_24khz()
        self.mode = mode
        self.lookahead = lookahead_frames
        self.window_frames = window_frames
        self.hop = self.cfg.frame_samples
        self.reset()

    # ------------------------------------------------------------------ api

    def reset(self) -> None:
        self._buffer: List[int] = []  # flat stream of codebook entries
        self._emitted_frames = 0
        self._first_done = False

    @property
    def frames_buffered(self) -> int:
        return len(self._buffer) // FRAME_TOKENS

    def push_tokens(self, codes: Sequence[int]) -> List[np.ndarray]:
        """Feed codebook entries (band-unshifted ids); returns PCM16 hops."""
        out: List[np.ndarray] = []
        for code in codes:
            self._buffer.append(int(code))
            if len(self._buffer) % FRAME_TOKENS == 0:
                hop = self._on_frame()
                if hop is not None:
                    out.append(hop)
        return out

    def flush(self) -> List[np.ndarray]:
        """End of stream: drain remaining frames (reference :262-293)."""
        out: List[np.ndarray] = []
        if self.mode == "parity":
            hop = self._parity_flush()
            if hop is not None:
                out.append(hop)
            return out
        # native: pad the trailing partial frame by repeating the last code,
        # then emit every not-yet-emitted frame with replicate right-context.
        if self._buffer and len(self._buffer) % FRAME_TOKENS != 0:
            pad = FRAME_TOKENS - len(self._buffer) % FRAME_TOKENS
            self._buffer.extend([self._buffer[-1]] * pad)
        k = self.frames_buffered
        while self._emitted_frames < k:
            out.append(self._emit_native(self._emitted_frames, k))
            self._emitted_frames += 1
        return out

    # ------------------------------------------------------------- internals

    def _frames(self) -> np.ndarray:
        k = self.frames_buffered
        return np.asarray(
            self._buffer[: k * FRAME_TOKENS], dtype=np.int32
        ).reshape(k, FRAME_TOKENS)

    def _on_frame(self) -> Optional[np.ndarray]:
        if self.mode == "parity":
            return self._parity_hop()
        k = self.frames_buffered
        e = self._emitted_frames
        ready = (e == 0 and k >= 1) or (k >= e + 1 + self.lookahead)
        if not ready:
            return None
        hop = self._emit_native(e, k)
        self._emitted_frames += 1
        return hop

    def _window_for(self, e: int, k: int) -> np.ndarray:
        """Static 7-frame window [e-4 .. e+2] (edge-replicated) for frame e,
        which sits at slot 4 -> samples [4*hop : 5*hop]."""
        frames = self._frames()
        idx = np.clip(np.arange(e - 4, e + 3), 0, k - 1)
        return frames[idx].reshape(-1)

    def _emit_native(self, e: int, k: int) -> np.ndarray:
        pcm = _decode_window_slice(
            self.params,
            jnp.asarray(self._window_for(e, k)),
            cfg=self.cfg,
            n_frames=self.window_frames,
            emit_lo=4 * self.hop,
            emit_hi=5 * self.hop,
        )
        return np.asarray(pcm)

    # --------------------------------------------------- batched planning

    def plan_push(self, codes: Sequence[int]) -> List[np.ndarray]:
        """Like push_tokens, but return decode *windows* instead of PCM.

        The caller batches windows from many streams into one
        ``decode_windows_batched`` dispatch (native mode only).
        """
        assert self.mode == "native"
        windows: List[np.ndarray] = []
        for code in codes:
            self._buffer.append(int(code))
            if len(self._buffer) % FRAME_TOKENS == 0:
                k = self.frames_buffered
                e = self._emitted_frames
                ready = (e == 0 and k >= 1) or (k >= e + 1 + self.lookahead)
                if ready:
                    windows.append(self._window_for(e, k))
                    self._emitted_frames += 1
        return windows

    def plan_flush(self) -> List[np.ndarray]:
        """Windows for the EOS drain (replicate-padded tail)."""
        assert self.mode == "native"
        if self._buffer and len(self._buffer) % FRAME_TOKENS != 0:
            pad = FRAME_TOKENS - len(self._buffer) % FRAME_TOKENS
            self._buffer.extend([self._buffer[-1]] * pad)
        k = self.frames_buffered
        windows = []
        while self._emitted_frames < k:
            windows.append(self._window_for(self._emitted_frames, k))
            self._emitted_frames += 1
        return windows

    # -------------------------------------------------------- parity mode

    def _parity_decode(self, tokens: np.ndarray) -> Optional[np.ndarray]:
        """convert_to_audio equivalent: decode, slice [2048:4096]."""
        n = len(tokens) // FRAME_TOKENS
        if n < 1:
            return None
        arr = np.asarray(tokens[: n * FRAME_TOKENS], dtype=np.int32)
        if np.any(arr < 0) or np.any(arr > self.cfg.codebook_size):
            return None
        total = n * self.cfg.frame_samples
        lo, hi = min(2048, total), min(4096, total)
        if hi <= lo:
            return np.zeros((0,), dtype=np.int16)  # the empty first chunk
        pcm = _decode_window_slice(
            self.params,
            jnp.asarray(arr),
            cfg=self.cfg,
            n_frames=n,
            emit_lo=lo,
            emit_hi=hi,
        )
        return np.asarray(pcm)

    def _parity_hop(self) -> Optional[np.ndarray]:
        count = len(self._buffer)
        if not self._first_done:
            if count >= 7:
                self._first_done = True
                return self._parity_decode(np.asarray(self._buffer[-7:]))
            return None
        if count % 7 != 0:
            return None
        if len(self._buffer) >= 49:
            window = self._buffer[-49:]
        elif len(self._buffer) >= 28:
            window = self._buffer[-28:]
        else:
            return None
        return self._parity_decode(np.asarray(window))

    def _parity_flush(self) -> Optional[np.ndarray]:
        buf = self._buffer
        if len(buf) >= 49:
            return self._parity_decode(np.asarray(buf[-49:]))
        if len(buf) >= 28:
            return self._parity_decode(np.asarray(buf[-28:]))
        if len(buf) >= 7:
            padded = buf + [buf[-1]] * (28 - len(buf))
            return self._parity_decode(np.asarray(padded))
        return None
