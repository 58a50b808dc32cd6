"""Auxiliary subsystems: perf monitoring, replay, watermarking."""
