"""Engine audio mode: batched SNAC decode per frame dispatch."""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.codec import SNACConfig, init_snac_params
from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
from project_morpheus_tpu.model import LlamaConfig, init_llama_params
from project_morpheus_tpu.model.sampling import SamplingParams


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny()  # full token space so audio-band ids exist
    params = init_llama_params(cfg, jax.random.key(2), dtype=jnp.float32)
    snac_cfg = SNACConfig.tiny()
    snac_params = init_snac_params(snac_cfg, seed=1)
    return cfg, params, snac_cfg, snac_params


def _engine(setup, **kw):
    cfg, params, snac_cfg, snac_params = setup
    return OrpheusEngine(
        params,
        cfg,
        EngineConfig(
            max_slots=2,
            max_seq_len=256,
            prefill_buckets=(16, 32),
            steps_per_sync=kw.pop("steps_per_sync", 7),
        ),
        codec=(snac_params, snac_cfg),
    )


def test_supports_audio_flag(setup):
    eng = _engine(setup)
    assert eng.supports_audio

    cfg, params, *_ = setup
    bare = OrpheusEngine(params, cfg, EngineConfig(max_slots=1, max_seq_len=64,
                                                   prefill_buckets=(16,)))
    assert not bare.supports_audio

    async def go():
        with pytest.raises(ValueError):
            await bare.submit([1], audio=True)
        await bare.close()

    asyncio.run(go())


def test_audio_request_streams_pcm(setup):
    """Random tiny weights rarely emit in-band audio tokens, so force the
    band by biasing: use temperature 1.5 + many tokens and just assert the
    machinery routes whatever audio tokens appear; the mock-free invariant
    is that the pcm stream terminates with well-formed hops."""
    _, _, snac_cfg, _ = setup

    async def go():
        eng = _engine(setup)
        sp = SamplingParams(temperature=1.4, max_tokens=140, stop_token_ids=())
        req = await eng.submit([128259, 72, 128260], sp, audio=True)
        chunks = [c async for c in req.pcm_chunks()]
        await eng.close()
        return chunks

    chunks = asyncio.run(go())
    for c in chunks:
        assert isinstance(c, bytes)
        assert len(c) == snac_cfg.frame_samples * 2  # full int16 hops


def test_audio_cancel_closes_pcm(setup):
    async def go():
        eng = _engine(setup)
        sp = SamplingParams(temperature=1.0, max_tokens=5000, stop_token_ids=())
        req = await eng.submit([5], sp, audio=True)
        await asyncio.sleep(0.2)
        eng.cancel(req)
        # stream must terminate
        chunks = [c async for c in req.pcm_chunks()]
        await eng.close()
        return True

    assert asyncio.run(go())
