"""Behavioral scenario probes ("scenes").

The distinctive test layer of the reference stack (SURVEY.md §4 tier 3):
each scene drives the orchestrator with a deterministic mock adapter and
asserts *behavioral shape* — chunk-size convergence, adapter identity
ordering across a swap, early termination + reset on barge-in — while
emitting human-auditable artifacts (timeline JSON + WAV).
"""

from . import barge_in, breathing_room, long_read, mid_stream_swap  # noqa: F401

ALL_SCENES = {
    "barge_in": barge_in,
    "breathing_room": breathing_room,
    "long_read": long_read,
    "mid_stream_swap": mid_stream_swap,
}
