"""Sharding: TP/FSDP param placement and numerical invariance on the
virtual 8-device CPU mesh (SURVEY.md §4 multi-process simulation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.model import (
    LlamaConfig,
    init_kv_cache,
    init_llama_params,
    llama_decode_step,
    llama_forward,
)
from project_morpheus_tpu.parallel import (
    engine_state_shardings,
    kv_cache_shardings,
    make_mesh,
    mesh_shape_for,
    param_shardings,
)


@pytest.fixture(scope="module")
def cfg():
    return LlamaConfig.tiny_vocab()


@pytest.fixture(scope="module")
def params(cfg):
    return init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)


def test_mesh_shapes():
    assert mesh_shape_for(8, 2) == (4, 2)
    with pytest.raises(ValueError):
        mesh_shape_for(8, 3)
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_initialize_distributed_noop_single_process(monkeypatch):
    from project_morpheus_tpu.parallel import initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False  # no group configured


def test_make_multihost_mesh_layout():
    from project_morpheus_tpu.parallel import make_multihost_mesh

    mesh = make_multihost_mesh(model=2)
    assert dict(mesh.shape) == {"data": jax.device_count() // 2, "model": 2}
    # every device appears exactly once
    ids = sorted(d.id for d in mesh.devices.flatten())
    assert ids == sorted(d.id for d in jax.devices())
    with pytest.raises(ValueError):
        make_multihost_mesh(model=3)
    with pytest.raises(ValueError):
        make_multihost_mesh(model=jax.local_device_count() * 2)


def test_tp_sharded_params_placement(cfg, params):
    mesh = make_mesh(model=2)
    shardings = param_shardings(cfg, mesh, mode="tp")
    sharded = jax.device_put(params, shardings)
    # wq column-sharded: per-device shard has half the heads
    shard_shape = sharded["layers"]["wq"].sharding.shard_shape(
        sharded["layers"]["wq"].shape
    )
    assert shard_shape[-1] == cfg.num_heads * cfg.head_dim // 2


def test_tp_forward_matches_unsharded(cfg, params):
    mesh = make_mesh(model=2)
    shardings = param_shardings(cfg, mesh, mode="tp")
    sharded = jax.device_put(params, shardings)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 8)))

    ref, _ = llama_forward(params, toks, cfg)
    got, _ = jax.jit(lambda p, t: llama_forward(p, t, cfg))(sharded, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4)


def test_fsdp_forward_matches_unsharded(cfg, params):
    mesh = make_mesh(model=1)
    shardings = param_shardings(cfg, mesh, mode="fsdp")
    sharded = jax.device_put(params, shardings)
    toks = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 8)))
    ref, _ = llama_forward(params, toks, cfg)
    got, _ = jax.jit(lambda p, t: llama_forward(p, t, cfg))(sharded, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4)


def test_tp_decode_step_matches_unsharded(cfg, params):
    mesh = make_mesh(model=2)
    pshard = param_shardings(cfg, mesh, mode="tp")
    sharded_params = jax.device_put(params, pshard)

    B, S = 8, 16
    cache = init_kv_cache(cfg, B, S, dtype=jnp.float32)
    tokens = jnp.asarray(np.arange(B), jnp.int32)
    lengths = jnp.zeros((B,), jnp.int32)

    ref_logits, _ = llama_decode_step(params, tokens, cfg, cache, lengths)

    cshard = kv_cache_shardings(mesh)
    sharded_cache = jax.device_put(cache, cshard)
    got_logits, new_cache = jax.jit(
        lambda p, t, c, l: llama_decode_step(p, t, cfg, c, l)
    )(sharded_params, tokens, sharded_cache, lengths)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=5e-4, atol=5e-4
    )


def test_engine_state_shardings_cover_dstate(cfg):
    mesh = make_mesh(model=2)
    shardings = engine_state_shardings(mesh)
    B = 8
    dstate = {
        "cache": init_kv_cache(cfg, B, 16, dtype=jnp.float32),
        "lengths": jnp.zeros((B,), jnp.int32),
        "active": jnp.zeros((B,), bool),
        "remaining": jnp.zeros((B,), jnp.int32),
        "is_audio": jnp.zeros((B,), bool),
        "custom_stops": jnp.full((B, 8), -1, jnp.int32),
        "rng": jax.random.split(jax.random.key(0), B),
        "last_tokens": jnp.zeros((B,), jnp.int32),
        "presence": jnp.zeros((B, cfg.padded_vocab), bool),
        "temp": jnp.zeros((B,), jnp.float32),
        "top_p": jnp.ones((B,), jnp.float32),
        "rep_pen": jnp.ones((B,), jnp.float32),
    }
    placed = jax.device_put(dstate, shardings)  # structures must match
    assert placed["cache"]["k"].sharding.spec == shardings["cache"]["k"].spec


def test_engine_runs_on_mesh_tp():
    """TP/DP-sharded serving: engine on a (2 data, 2 model) CPU mesh."""
    import asyncio

    import jax
    import jax.numpy as jnp

    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.sampling import SamplingParams
    from project_morpheus_tpu.parallel import make_mesh

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)
    mesh = make_mesh(model=2, devices=jax.devices()[:4])

    async def go():
        eng = OrpheusEngine(
            params,
            cfg,
            EngineConfig(max_slots=2, max_seq_len=64, prefill_buckets=(16,)),
            mesh=mesh,
        )
        assert "wqkv" not in eng.params["layers"], "TP must not fuse qkv"
        sp = SamplingParams(temperature=0.0, max_tokens=6, stop_token_ids=())
        req = await eng.submit([5, 6, 8], sp)
        toks = [t async for t in req.tokens()]
        await eng.close()
        return toks

    toks = asyncio.run(go())
    assert len(toks) == 6


def test_engine_mesh_matches_unsharded():
    """Greedy decode on a data-only mesh equals the single-device engine."""
    import asyncio

    import jax
    import jax.numpy as jnp

    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.sampling import SamplingParams
    from project_morpheus_tpu.parallel import make_mesh

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)

    async def run(mesh):
        eng = OrpheusEngine(
            params,
            cfg,
            EngineConfig(max_slots=2, max_seq_len=64, prefill_buckets=(16,)),
            mesh=mesh,
        )
        sp = SamplingParams(temperature=0.0, max_tokens=6, stop_token_ids=())
        req = await eng.submit([5, 6, 8], sp)
        toks = [t async for t in req.tokens()]
        await eng.close()
        return toks

    mesh = make_mesh(model=1, devices=jax.devices()[:2])
    a = asyncio.run(run(mesh))
    b = asyncio.run(run(None))
    assert a == b


def test_shardings_like_quantized_and_fused():
    import jax
    import jax.numpy as jnp

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.quant import (
        fuse_layer_weights,
        quantize_params_int8,
    )
    from project_morpheus_tpu.parallel import (
        make_mesh,
        param_shardings,
        shardings_like,
    )

    cfg = LlamaConfig.tiny_vocab()
    params = fuse_layer_weights(
        quantize_params_int8(
            init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)
        )
    )
    mesh = make_mesh(model=1, devices=jax.devices()[:2])
    sh = shardings_like(params, param_shardings(cfg, mesh, mode="replicated"))
    # every array leaf got a sharding; device_put must succeed
    placed = jax.device_put(params, sh)
    assert placed["layers"]["wqkv"]["q"].shape == params["layers"]["wqkv"]["q"].shape


def test_engine_tp_int8_matches_unsharded():
    """TP serving with int8 weights: the per-output-column scales shard
    with their payloads (shardings_like) and the greedy token trace equals
    the unsharded int8 engine's."""
    import asyncio

    import jax

    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.quant import quantize_params_int8
    from project_morpheus_tpu.model.sampling import SamplingParams
    from project_morpheus_tpu.parallel import make_mesh

    cfg = LlamaConfig.tiny_vocab()
    params = quantize_params_int8(
        init_llama_params(cfg, jax.random.key(5), dtype=jnp.float32)
    )
    ecfg = EngineConfig(max_slots=2, max_seq_len=64, prefill_buckets=(16,),
                        default_stop_ids=())
    sp = SamplingParams(temperature=0.0, max_tokens=6, stop_token_ids=())

    async def run(mesh):
        eng = OrpheusEngine(params, cfg, ecfg, mesh=mesh, seed=3)
        req = await eng.submit([5, 6, 7], sp)
        toks = [t async for t in req.tokens()]
        await eng.close()
        return toks

    base = asyncio.run(run(None))
    tp = asyncio.run(run(make_mesh(model=2, devices=jax.devices()[:4])))
    assert base == tp, f"TP int8 trace {tp} != unsharded {base}"


def test_engine_mesh_audio_fused_matches_unsharded():
    """The fused frame program (decode + device code ring + batched SNAC
    hop) on a data-sharded mesh must emit byte-identical PCM to the
    unsharded engine: the DP-sharded ring state and the sharded
    snac_stream_body interaction had no mesh coverage (advisor r3)."""
    import asyncio

    import jax
    import jax.numpy as jnp

    from project_morpheus_tpu.codec import SNACConfig, init_snac_params
    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.model.sampling import SamplingParams
    from project_morpheus_tpu.parallel import make_mesh

    cfg = LlamaConfig.tiny()
    params = init_llama_params(cfg, jax.random.key(2), dtype=jnp.float32)
    # steer greedy decoding into the audio band so the ring carries codes
    lo = 128_266
    params["embed"] = params["embed"].at[lo : lo + 7 * 4096].multiply(10.0)
    snac_cfg = SNACConfig.tiny()
    snac_params = init_snac_params(snac_cfg, seed=1)

    async def run(mesh):
        eng = OrpheusEngine(
            params,
            cfg,
            EngineConfig(
                max_slots=2,
                max_seq_len=256,
                prefill_buckets=(16, 32),
                steps_per_sync=7,
                frames_per_dispatch=2,
                lenient_audio_codes=True,
                default_stop_ids=(),
            ),
            codec=(snac_params, snac_cfg),
            mesh=mesh,
            seed=7,
        )
        sp = SamplingParams(temperature=0.0, max_tokens=64, stop_token_ids=())
        req = await eng.submit([128259, 72, 128260], sp, audio=True)
        toks, pcm = [], []

        async def drain_tokens():
            async for t in req.tokens():
                toks.append(t)

        async def drain_pcm():
            async for c in req.pcm_chunks():
                pcm.append(c)

        await asyncio.gather(drain_tokens(), drain_pcm())
        await eng.close()
        return toks, b"".join(pcm)

    mesh = make_mesh(model=1, devices=jax.devices()[:2])  # data=2
    toks_m, pcm_m = asyncio.run(run(mesh))
    toks_u, pcm_u = asyncio.run(run(None))
    assert toks_m == toks_u, "greedy traces diverged across mesh postures"
    assert len(pcm_m) > 0
    assert pcm_m == pcm_u, "mesh-sharded fused PCM != unsharded fused PCM"
