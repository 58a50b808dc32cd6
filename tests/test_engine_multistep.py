"""Multi-step decode: one dispatch per SNAC frame, device-side stops."""
import asyncio

import jax
import jax.numpy as jnp
import pytest

from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
from project_morpheus_tpu.model import LlamaConfig, init_llama_params
from project_morpheus_tpu.model.sampling import SamplingParams


@pytest.fixture(scope="module")
def cfg():
    return LlamaConfig.tiny_vocab()


@pytest.fixture(scope="module")
def params(cfg):
    return init_llama_params(cfg, jax.random.key(1), dtype=jnp.float32)


def _engine(params, cfg, steps_per_sync):
    return OrpheusEngine(
        params,
        cfg,
        EngineConfig(
            max_slots=3,
            max_seq_len=128,
            prefill_buckets=(16, 32),
            default_stop_ids=(7,),
            steps_per_sync=steps_per_sync,
        ),
    )


def test_multistep_matches_singlestep_greedy(params, cfg):
    sp = SamplingParams(temperature=0.0, max_tokens=21, stop_token_ids=())

    async def run(steps_per_sync):
        eng = _engine(params, cfg, steps_per_sync)
        req = await eng.submit([5, 9, 2], sp)
        out = [t async for t in req.tokens()]
        await eng.close()
        return out

    single = asyncio.run(run(1))
    multi = asyncio.run(run(7))
    assert multi == single


def test_multistep_stop_token_terminates(params, cfg):
    """Whatever the trace, the stream never contains the stop id and the
    engine terminates (device-side deactivation path executes)."""
    sp = SamplingParams(temperature=1.2, max_tokens=70, stop_token_ids=(7,))

    async def run():
        eng = _engine(params, cfg, 7)
        reqs = [await eng.submit([i + 1, i + 2], sp) for i in range(3)]
        outs = [[t async for t in r.tokens()] for r in reqs]
        await eng.close()
        return outs

    for out in asyncio.run(run()):
        assert 7 not in out
        assert len(out) <= 70


def test_multistep_concurrent_isolated(params, cfg):
    sp = SamplingParams(temperature=0.0, max_tokens=10, stop_token_ids=())

    async def crowded():
        eng = _engine(params, cfg, 7)
        other = await eng.submit([30], sp)
        req = await eng.submit([4, 4, 4], sp)
        out = [t async for t in req.tokens()]
        async for _ in other.tokens():
            pass
        await eng.close()
        return out

    async def solo():
        eng = _engine(params, cfg, 7)
        req = await eng.submit([4, 4, 4], sp)
        out = [t async for t in req.tokens()]
        await eng.close()
        return out

    assert asyncio.run(crowded()) == asyncio.run(solo())
