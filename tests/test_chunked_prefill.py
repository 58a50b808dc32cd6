"""Chunked prefill: identical results to a single full-causal prefill.

Long prompts (up to the reference's n_ctx 8192, llama_local.py:45-46) are
written chunk by chunk, each attending to cache history.  The invariants:

- the KV cache after chunked writes equals the single-shot cache;
- the final-position logits match, so the first sampled token's
  distribution is unchanged;
- the engine accepts prompts longer than its largest prefill bucket with
  no truncation (ctx_len == prompt length) and decodes normally.
"""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.model import (
    LlamaConfig,
    init_kv_cache,
    init_llama_params,
    llama_forward,
    llama_prefill_chunk,
)


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)
    return cfg, params


def test_chunk_kernel_matches_full_forward(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    n = 45
    prompt = rng.integers(1, cfg.vocab_size, size=(n,)).astype(np.int32)

    # single-shot: full forward writing the cache
    cache_a = init_kv_cache(cfg, 2, 64, jnp.float32)
    logits_a, cache_a = llama_forward(
        params,
        jnp.asarray(prompt[None, :]),
        cfg,
        cache=cache_a,
        cache_offset=jnp.zeros((1,), jnp.int32),
        cache_slots=jnp.asarray([1]),
    )
    last_a = np.asarray(logits_a[0, n - 1])

    # chunked: 16 + 16 + 13 (padded to 16), history buckets 16/32/64
    cache_b = init_kv_cache(cfg, 2, 64, jnp.float32)
    chunk = 16
    offset = 0
    for lo in range(0, 32, chunk):
        _, cache_b = llama_prefill_chunk(
            params,
            jnp.asarray(prompt[lo : lo + chunk]),
            cfg,
            cache_b,
            jnp.asarray(lo, jnp.int32),
            jnp.asarray(1, jnp.int32),
            jnp.asarray(chunk, jnp.int32),
            hist_bucket=lo + chunk,
        )
        offset = lo + chunk
    rest = prompt[offset:]
    padded = np.zeros((chunk,), np.int32)
    padded[: len(rest)] = rest
    logits_b, cache_b = llama_prefill_chunk(
        params,
        jnp.asarray(padded),
        cfg,
        cache_b,
        jnp.asarray(offset, jnp.int32),
        jnp.asarray(1, jnp.int32),
        jnp.asarray(len(rest), jnp.int32),
        hist_bucket=64,
    )

    np.testing.assert_allclose(np.asarray(logits_b), last_a, atol=2e-4, rtol=2e-3)
    # cache contents over the real prompt extent must agree (slot 1)
    for name in ("k", "v"):
        a = np.asarray(cache_a[name])[:, 1, :, :n]
        b = np.asarray(cache_b[name])[:, 1, :, :n]
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=2e-3, err_msg=name)
    # the untouched slot stays zero
    assert float(np.abs(np.asarray(cache_b["k"])[:, 0]).max()) == 0.0


def test_engine_long_prompt_no_truncation(setup):
    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.model.sampling import SamplingParams

    cfg, params = setup
    eng = OrpheusEngine(
        params,
        cfg,
        EngineConfig(
            max_slots=2,
            max_seq_len=128,
            prefill_buckets=(16,),
            prefill_chunk=16,
            context_buckets=(32, 64, 128),
            cache_dtype="float32",
            steps_per_sync=1,
        ),
    )
    rng = np.random.default_rng(1)
    prompt = rng.integers(1, cfg.vocab_size, size=(70,)).tolist()

    async def go():
        req = await eng.submit(prompt, SamplingParams(max_tokens=10))
        toks = [t async for t in req.tokens()]
        await eng.close()
        return req, toks

    req, toks = asyncio.run(go())
    assert req.ctx_len == 70  # longer than every prefill bucket, untruncated
    assert 1 <= len(toks) <= 10


@pytest.mark.parametrize("cache_dtype", ["float32", "int8"])
def test_batched_chunk_prefill_matches_sequential(setup, cache_dtype):
    cfg, params = setup
    """One batched J-stream chunk round must write the same cache and
    produce the same final logits as J sequential single-chunk programs
    (the burst-admission fast path; llama_prefill_chunk_batch)."""
    import jax.numpy as jnp

    from project_morpheus_tpu.model import (
        init_kv_cache,
        llama_prefill_chunk,
        llama_prefill_chunk_batch,
    )

    rng = np.random.default_rng(7)
    J, C, S = 2, 16, 64
    prompts = rng.integers(1, cfg.vocab_size, size=(J, 40)).astype(np.int32)
    dt = jnp.float32 if cache_dtype == "float32" else jnp.int8

    # sequential reference
    cache_a = init_kv_cache(cfg, J, S, dt)
    logits_a = [None] * J
    for lo, hist in ((0, 16), (16, 32)):
        for j in range(J):
            _, cache_a = llama_prefill_chunk(
                params, jnp.asarray(prompts[j, lo : lo + C]), cfg, cache_a,
                jnp.asarray(lo, jnp.int32), jnp.asarray(j, jnp.int32),
                jnp.asarray(C, jnp.int32), hist_bucket=hist,
            )
    rest = np.zeros((J, C), np.int32)
    rest[:, : 40 - 32] = prompts[:, 32:]
    for j in range(J):
        lg, cache_a = llama_prefill_chunk(
            params, jnp.asarray(rest[j]), cfg, cache_a,
            jnp.asarray(32, jnp.int32), jnp.asarray(j, jnp.int32),
            jnp.asarray(40 - 32, jnp.int32), hist_bucket=64,
        )
        logits_a[j] = np.asarray(lg)

    # batched
    cache_b = init_kv_cache(cfg, J, S, dt)
    for lo, hist in ((0, 16), (16, 32)):
        _, cache_b = llama_prefill_chunk_batch(
            params, jnp.asarray(prompts[:, lo : lo + C]), cfg, cache_b,
            jnp.full((J,), lo, jnp.int32), jnp.arange(J, dtype=jnp.int32),
            jnp.full((J,), C, jnp.int32), hist_bucket=hist,
        )
    logits_b, cache_b = llama_prefill_chunk_batch(
        params, jnp.asarray(rest), cfg, cache_b,
        jnp.full((J,), 32, jnp.int32), jnp.arange(J, dtype=jnp.int32),
        jnp.full((J,), 40 - 32, jnp.int32), hist_bucket=64,
    )

    for key in cache_a:
        np.testing.assert_allclose(
            np.asarray(cache_a[key], np.float32),
            np.asarray(cache_b[key], np.float32),
            rtol=1e-4, atol=1e-4,
            err_msg=f"cache[{key}] diverged",
        )
    np.testing.assert_allclose(
        np.stack(logits_a), np.asarray(logits_b), rtol=2e-3, atol=2e-3
    )


def test_long_prompt_burst_matches_solo_traces(setup):
    """A burst of seeded long-prompt requests — admitted in lockstep and
    prefilled through BATCHED chunk rounds — must reproduce each request's
    solo trace exactly (the solo path uses the single-chunk program), so
    the batched rounds are provably equivalent inside the live engine."""
    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine
    from project_morpheus_tpu.model.sampling import SamplingParams

    cfg, params = setup
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, cfg.vocab_size, size=(70,)).tolist()
               for _ in range(3)]

    def engine():
        return OrpheusEngine(params, cfg, EngineConfig(
            max_slots=4, max_seq_len=256, prefill_buckets=(16, 32),
            prefill_chunk=32, context_buckets=(64, 128, 256),
            steps_per_sync=7, default_stop_ids=()))

    def sp(i):
        return SamplingParams(temperature=0.9, max_tokens=10,
                              stop_token_ids=(), seed=100 + i)

    async def solo(i):
        eng = engine()
        req = await eng.submit(prompts[i], sp(i))
        toks = [t async for t in req.tokens()]
        await eng.close()
        return toks

    async def burst():
        eng = engine()
        reqs = [await eng.submit(prompts[i], sp(i)) for i in range(3)]
        outs = []
        for r in reqs:
            outs.append([t async for t in r.tokens()])
        await eng.close()
        return outs

    solos = [asyncio.run(solo(i)) for i in range(3)]
    bursts = asyncio.run(burst())
    for i, (a, b) in enumerate(zip(solos, bursts)):
        assert len(a) == 10
        assert a == b, f"stream {i}: burst trace {b} != solo {a}"


def test_w8a8_chunk_prefill_error_bound(setup):
    """w8a8 (int8-activation) chunk prefill vs the weight-only dequant
    path on INT8 weights: the accuracy gate behind
    EngineConfig.prefill_w8a8 (VERDICT r4 next #4).  Bounds BOTH the
    final-chunk logit error (first sampled token's distribution) and the
    written KV cache error — both feed everything downstream.  The
    reference bound here is the weight-only path itself (already int8
    weights), so this isolates the activation-quantisation noise."""
    from project_morpheus_tpu.model.llama import llama_prefill_chunk
    from project_morpheus_tpu.model.quant import quantize_params_int8

    cfg, params = setup
    qparams = quantize_params_int8(params)
    rng = np.random.default_rng(7)
    n = 48
    prompt = jnp.asarray(
        rng.integers(1, cfg.vocab_size, size=(n,)).astype(np.int32)
    )

    outs = {}
    for w8a8 in (False, True):
        cache = init_kv_cache(cfg, 1, 64, jnp.int8)
        logits, cache = llama_prefill_chunk(
            qparams, prompt, cfg, cache,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(n, jnp.int32), hist_bucket=64, w8a8=w8a8,
        )
        outs[w8a8] = (np.asarray(logits), jax.tree.map(np.asarray, cache))

    la, lb = outs[False][0], outs[True][0]
    # logit scale-relative error: the sampling-relevant quantity
    denom = max(np.std(la), 1e-6)
    rel = np.max(np.abs(la - lb)) / denom
    assert rel < 0.25, f"w8a8 logit error {rel:.3f} of logit std"
    # top-1 agreement on the first sampled token
    assert np.argmax(la) == np.argmax(lb), "w8a8 flipped the greedy token"
    # KV payload: int8 codes may differ by a few LSB; scales stay close
    ka, kb = outs[False][1]["k"], outs[True][1]["k"]
    frac_diff = np.mean(ka[:, 0, :n] != kb[:, 0, :n])
    assert frac_diff < 0.35, f"{frac_diff:.2%} of int8 KV codes changed"
    sa, sb = outs[False][1]["scale"], outs[True][1]["scale"]
    np.testing.assert_allclose(
        sb[:, 0, :n], sa[:, 0, :n], rtol=0.1, atol=1e-5
    )


def test_chunk_plan_covers_prompt_and_feeds_warmup(setup):
    """_plan_chunks invariants: offsets tile the prompt exactly, widths
    halve past fine_chunk_hist, exactly one final entry, and _job_next
    agrees with the plan at every offset (warmup and serving share the
    plan, so drift = a mid-serving compile)."""
    from project_morpheus_tpu.engine import EngineConfig, OrpheusEngine

    cfg, params = setup
    eng = OrpheusEngine(
        params,
        cfg,
        EngineConfig(
            max_slots=2,
            max_seq_len=256,
            prefill_buckets=(16, 32),
            prefill_chunk=32,
            context_buckets=(64, 128, 256),
            fine_chunk_hist=128,
        ),
    )
    for fine in (True, False):
        for total in (40, 64, 100, 200, 250):
            plan = eng._plan_chunks(total, fine=fine)
            off = 0
            finals = 0
            for p_off, clen, hist, final in plan:
                assert p_off == off
                assert hist >= min(off + clen, 256)
                if final:
                    finals += 1
                    assert clen in (16, 32)
                    assert total - off <= clen
                else:
                    assert clen in (16, 32)
                    # live plan: widths halve once the attended history
                    # passes the knob; cold plan keeps full width
                    if off >= 128:
                        assert clen == (16 if fine else 32), (
                            total, off, clen, fine)
                    off += clen
                    continue
            assert finals == 1
            # _job_next agrees with the plan at every reachable offset
            job = {"ids": list(range(total)), "offset": 0, "fine": fine}
            for p_off, clen, hist, final in plan:
                job["offset"] = p_off
                phase, got_clen, got_hist = eng._job_next(job)
                assert got_clen == clen and got_hist == hist
                assert (phase == "final") == final
