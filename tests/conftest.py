"""Hermetic test configuration.

Mirrors the reference's testing doctrine (SURVEY.md §4): no accelerator, no
network, no weights required.  JAX runs on a virtual 8-device CPU platform
so mesh/sharding logic (DP/TP/FSDP) is exercised without TPU hardware —
the TPU-equivalent of the reference's stubbed torch/llama_cpp imports.
"""
import os

# Hard override: the session environment pins JAX_PLATFORMS=axon (the real
# TPU); tests must stay on the virtual CPU platform regardless.  Plugins
# (jaxtyping) import jax before this conftest runs, so the env var alone is
# too late — jax.config snapshots it at import.  Update the config directly;
# XLA_FLAGS is still read lazily at CPU-backend creation, so the virtual
# 8-device topology takes effect as long as no CPU backend exists yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
assert jax.device_count() == 8, "expected the virtual 8-device CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
