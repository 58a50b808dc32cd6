"""Continuous-batching engine: admission, streaming, stop, cancel/barge-in.

Mirrors the reference engine behaviours: per-request token streams
(engine_class.py:103-134), stop-token termination, and slot eviction as
the barge-in reset path (core.py:118-125, llama_local.py:152-157).
"""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np
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


def _engine(params, cfg, **kw):
    ecfg = EngineConfig(
        max_slots=kw.pop("max_slots", 4),
        max_seq_len=kw.pop("max_seq_len", 128),
        prefill_buckets=(16, 32),
        cache_dtype=kw.pop("cache_dtype", "bfloat16"),
        default_stop_ids=(7,),  # arbitrary id within tiny vocab
    )
    return OrpheusEngine(params, cfg, ecfg, **kw)


def _run(coro):
    return asyncio.run(coro)


def test_generates_until_max_tokens(params, cfg):
    async def go():
        eng = _engine(params, cfg)
        req = await eng.submit([5, 6, 8], SamplingParams(temperature=0.8, max_tokens=12, stop_token_ids=()))
        toks = [t async for t in req.tokens()]
        await eng.close()
        return toks

    toks = _run(go())
    # stop id 7 may terminate early; otherwise exactly max_tokens
    assert 1 <= len(toks) <= 12
    assert all(0 <= t < cfg.vocab_size for t in toks)


def test_concurrent_requests_isolated(params, cfg):
    async def go():
        eng = _engine(params, cfg)
        sp = SamplingParams(temperature=0.0, max_tokens=8, stop_token_ids=())
        reqs = [await eng.submit([3, 11 + i], sp) for i in range(3)]
        outs = await asyncio.gather(*[collect(r) for r in reqs])
        await eng.close()
        return outs

    async def collect(r):
        return [t async for t in r.tokens()]

    outs = _run(go())
    assert all(len(o) >= 1 for o in outs)
    # greedy decoding is deterministic per prompt: same prompt = same tokens
    outs2 = _run(go())
    for a, b in zip(outs, outs2):
        assert a == b


def test_greedy_determinism_vs_solo(params, cfg):
    """A request decoded alongside others must match the same request alone
    (continuous batching must not leak state across slots)."""
    sp = SamplingParams(temperature=0.0, max_tokens=6, stop_token_ids=())

    async def solo():
        eng = _engine(params, cfg)
        req = await eng.submit([9, 4, 2], sp)
        out = [t async for t in req.tokens()]
        await eng.close()
        return out

    async def crowded():
        eng = _engine(params, cfg)
        others = [await eng.submit([13 + i], sp) for i in range(2)]
        req = await eng.submit([9, 4, 2], sp)
        out = [t async for t in req.tokens()]
        for o in others:
            async for _ in o.tokens():
                pass
        await eng.close()
        return out

    assert _run(solo()) == _run(crowded())


def test_cancel_frees_slot(params, cfg):
    async def go():
        eng = _engine(params, cfg, max_slots=1)
        sp = SamplingParams(temperature=0.9, max_tokens=1000, stop_token_ids=())
        req1 = await eng.submit([2], sp)
        # pull a few tokens then barge in
        got = 0
        async for _ in req1.tokens():
            got += 1
            if got == 3:
                eng.cancel(req1)
                break
        # slot must free up for a second request
        req2 = await eng.submit([3], SamplingParams(temperature=0.0, max_tokens=4, stop_token_ids=()))
        out2 = [t async for t in req2.tokens()]
        await eng.close()
        return got, out2

    got, out2 = _run(go())
    assert got == 3 and len(out2) >= 1


def test_stop_token_ends_stream(params, cfg):
    """Force the stop id by making it the argmax via a crafted prompt sweep:
    instead we just check the invariant — stream never contains a stop id."""
    async def go():
        eng = _engine(params, cfg)
        sp = SamplingParams(temperature=1.0, max_tokens=64, stop_token_ids=(7,))
        reqs = [await eng.submit([i + 1], sp) for i in range(4)]
        outs = [[t async for t in r.tokens()] for r in reqs]
        await eng.close()
        return outs

    for out in _run(go()):
        assert 7 not in out


def test_stale_frame_not_delivered_to_reassigned_slot(params, cfg):
    """Pipelined dispatch: a frame snapshotted against an old request must
    not leak tokens into a new request admitted on the same slot."""
    from project_morpheus_tpu.engine.request import Request, RequestState

    async def go():
        eng = _engine(params, cfg)
        sp = SamplingParams(temperature=0.0, max_tokens=4, stop_token_ids=())
        old = Request([5, 6], sp.clipped())
        old.state = RequestState.DECODING
        old.slot = 1
        new = Request([5, 6], sp.clipped())
        new.state = RequestState.DECODING
        new.slot = 1
        eng._by_slot[1] = new  # slot was re-assigned while frame was in flight
        snapshot = {1: old}
        eng._process_frame((np.asarray([[0, 9, 0, 0]]), None, None), snapshot)
        await eng.close()
        return old, new

    old, new = _run(go())
    assert old.token_queue.qsize() == 0, "stale frame leaked into old request"
    assert new.token_queue.qsize() == 0, "stale frame leaked into new request"


def test_pipelined_sequential_requests_clean(params, cfg):
    """Back-to-back requests on a 1-slot engine stay independent."""
    async def go():
        eng = _engine(params, cfg, max_slots=1)
        sp = SamplingParams(temperature=0.0, max_tokens=5, stop_token_ids=())
        r1 = await eng.submit([5, 6, 8], sp)
        t1 = [t async for t in r1.tokens()]
        r2 = await eng.submit([5, 6, 8], sp)
        t2 = [t async for t in r2.tokens()]
        await eng.close()
        return t1, t2

    t1, t2 = _run(go())
    assert t1 == t2, "greedy decode of identical prompts must match"


def test_async_admission_mid_stream_determinism(params, cfg):
    """A request admitted while another stream is mid-decode (async
    admission: prefill overlapped with in-flight frames) must produce the
    same greedy tokens as the same request admitted alone, with the first
    token delivered before any decode tokens."""
    sp = SamplingParams(temperature=0.0, max_tokens=6, stop_token_ids=())

    async def solo():
        eng = _engine(params, cfg)
        req = await eng.submit([9, 4, 2], sp)
        out = [t async for t in req.tokens()]
        await eng.close()
        return out

    async def staggered():
        eng = _engine(params, cfg)
        bg = await eng.submit([13], SamplingParams(temperature=0.0, max_tokens=40, stop_token_ids=()))
        # let the background stream get several frames in flight
        got = 0
        async for _ in bg.tokens():
            got += 1
            if got == 8:
                break
        late = await eng.submit([9, 4, 2], sp)
        out = [t async for t in late.tokens()]
        eng.cancel(bg)
        await eng.close()
        return out

    assert _run(solo()) == _run(staggered())


def test_cancel_while_first_token_pending(params, cfg):
    """Cancel issued between admission (prefill dispatched) and the first
    frame readback: no token may be delivered, and the slot must recycle."""
    async def go():
        eng = _engine(params, cfg, max_slots=1)
        sp = SamplingParams(temperature=0.0, max_tokens=8, stop_token_ids=())
        req = await eng.submit([4, 4], sp)
        # admission happens inside the loop task; spin until the prefill
        # has been dispatched but (possibly) not yet flushed
        while req.slot is None and not req.done:
            await asyncio.sleep(0)
        eng.cancel(req)
        toks = [t async for t in req.tokens()]
        # the slot must be reusable afterwards
        req2 = await eng.submit([5, 6], sp)
        toks2 = [t async for t in req2.tokens()]
        await eng.close()
        return toks, toks2

    toks, toks2 = _run(go())
    # the first token may already have been flushed before the cancel; the
    # invariant is prompt stream termination and slot recycling
    assert len(toks) <= 2
    assert len(toks2) >= 1


def test_backpressure_gates_saturated_consumer(params, cfg):
    """A stalled consumer must not buffer the whole utterance: once its
    queue hits max_queued_tokens the slot is gated out of dispatches (KV
    kept), co-batched streams keep flowing, and draining resumes it
    (reference pull-pacing, orchestrator/core.py:88-117)."""

    async def go():
        ecfg = EngineConfig(
            max_slots=2,
            max_seq_len=512,
            prefill_buckets=(16,),
            default_stop_ids=(),
            max_queued_tokens=10,
            steps_per_sync=7,
        )
        eng = OrpheusEngine(params, cfg, ecfg)
        sp = SamplingParams(temperature=0.9, max_tokens=200, stop_token_ids=())
        slow = await eng.submit([5, 6], sp)
        fast = await eng.submit(
            [3, 4], SamplingParams(temperature=0.9, max_tokens=80, stop_token_ids=())
        )
        fast_out = [t async for t in fast.tokens()]
        # the fast stream finished its 80 tokens while `slow` was never
        # drained: slow's queue is bounded by the watermark plus at most
        # two dispatch units (the overlap pipeline keeps one dispatched-
        # but-unprocessed frame in flight when the gate closes)
        bound = ecfg.max_queued_tokens + 2 * ecfg.steps_per_sync
        assert slow.token_queue.qsize() <= bound
        assert len(fast_out) == 80
        # draining the slow consumer resumes generation to completion
        slow_out = [t async for t in slow.tokens()]
        await eng.close()
        return slow_out

    out = _run(go())
    assert len(out) == 200


def test_long_admission_interleaves_chunks_with_frames(params, cfg, monkeypatch):
    """An 8k-class admission must never dispatch its prefill chunks
    back-to-back while another stream is decoding: at most one chunk rides
    between consecutive decode frames (VERDICT r2 next #4)."""
    import project_morpheus_tpu.engine.engine as eng_mod

    events = []
    real_chunk = eng_mod._prefill_chunk

    def spy_chunk(*a, **k):
        events.append("chunk")
        return real_chunk(*a, **k)

    monkeypatch.setattr(eng_mod, "_prefill_chunk", spy_chunk)

    async def go():
        ecfg = EngineConfig(
            max_slots=2,
            max_seq_len=256,
            prefill_buckets=(16,),
            prefill_chunk=16,
            context_buckets=(64, 128, 256),
            default_stop_ids=(),
            steps_per_sync=7,
        )
        eng = OrpheusEngine(params, cfg, ecfg)
        orig_dispatch = eng._dispatch_frame

        def spy_dispatch(gate):
            events.append("frame")
            return orig_dispatch(gate)

        eng._dispatch_frame = spy_dispatch

        live = await eng.submit(
            [5, 6], SamplingParams(temperature=0.9, max_tokens=500,
                                   stop_token_ids=())
        )
        live_out = []

        async def consume():
            async for t in live.tokens():
                live_out.append(t)

        consumer = asyncio.get_event_loop().create_task(consume())
        while live.generated < 7:
            await asyncio.sleep(0.01)
        # 80-token prompt with chunk=16 -> 4 full chunks + 1 sampling chunk
        long_ids = [2 + (i % 40) for i in range(80)]
        lr = await eng.submit(
            long_ids, SamplingParams(max_tokens=3, stop_token_ids=())
        )
        long_out = [t async for t in lr.tokens()]
        eng.cancel(live)
        await consumer
        await eng.close()
        return long_out, live_out

    long_out, live_out = _run(go())
    assert len(long_out) == 3           # the long prompt decoded fine
    assert len(live_out) >= 7           # the live stream kept flowing
    # cadence invariant: chunks never ran back-to-back while live decoded.
    # The FIRST chunk is the live stream's own admission (every prompt now
    # takes the unified chunk path); the long prompt contributes 5 more
    # (4 full 16-token chunks + the sampling chunk), each separated from
    # the next by at least one decode frame.
    chunk_idx = [i for i, e in enumerate(events) if e == "chunk"]
    assert len(chunk_idx) == 6
    chunk_idx = chunk_idx[1:]
    for a, b in zip(chunk_idx, chunk_idx[1:]):
        assert any(e == "frame" for e in events[a + 1 : b]), (
            f"prefill chunks at {a} and {b} dispatched with no decode "
            f"frame between them: {events}"
        )


def test_custom_stop_is_per_request(params, cfg):
    """One request's custom stop id must stop THAT request only.

    The former device-side static stop-id *union* deactivated any lane
    sampling any in-flight request's stop id; the per-slot custom_stops
    device array keeps lanes independent.  Greedy sampling makes the
    traces deterministic: request B (no custom stops) must produce the
    identical trace whether or not request A declares B's tokens as stops.
    """
    sp_free = SamplingParams(temperature=0.0, max_tokens=8, stop_token_ids=())

    async def run_pair(stop_for_a):
        eng = _engine(params, cfg)
        ra = await eng.submit(
            [3, 11],
            SamplingParams(
                temperature=0.0, max_tokens=8, stop_token_ids=stop_for_a
            ),
        )
        rb = await eng.submit([3, 12], sp_free)
        ta = [t async for t in ra.tokens()]
        tb = [t async for t in rb.tokens()]
        await eng.close()
        return ta, tb

    # baseline traces with no custom stops anywhere
    ta0, tb0 = _run(run_pair(()))
    assert len(tb0) >= 2
    # A declares B's second token as a custom stop: B must be unaffected,
    # and A must stop early IF it ever samples that id (it may not).
    ta1, tb1 = _run(run_pair((tb0[1],)))
    assert tb1 == tb0, "custom stop of request A leaked into request B"
    if tb0[1] in ta0:
        cut = ta0.index(tb0[1])
        assert ta1 == ta0[:cut], "A did not stop at its own custom stop id"


def test_device_budget_caps_generation_exactly(params, cfg):
    """max_tokens is enforced on device (_post_step countdown): the token
    stream carries exactly max_tokens ids when no stop id fires."""
    async def go():
        eng = _engine(params, cfg)
        # default stop id 7 excluded by sampling greedily from a prompt
        # whose greedy continuation avoids it — retry over temperatures
        sp = SamplingParams(temperature=0.9, max_tokens=9, stop_token_ids=())
        reqs = [await eng.submit([5, 9 + i], sp) for i in range(3)]
        outs = [[t async for t in r.tokens()] for r in reqs]
        await eng.close()
        return outs

    outs = _run(go())
    for toks in outs:
        # stop id 7 may cut a trace short; never longer than the budget
        assert len(toks) <= 9
        if 7 not in toks:
            assert len(toks) == 9


def test_seeded_request_is_schedule_independent(params, cfg):
    """SamplingParams.seed must reproduce the exact token trace no matter
    what else is co-batched (per-slot device key chains, advanced only on
    emitting steps) — the property the adapter descriptor's supports_seed
    advertises (reference adapter_registry.py:48-60)."""
    sp_seeded = SamplingParams(
        temperature=0.9, max_tokens=12, stop_token_ids=(), seed=1234
    )

    async def solo():
        eng = _engine(params, cfg)
        req = await eng.submit([5, 6, 8], sp_seeded)
        toks = [t async for t in req.tokens()]
        await eng.close()
        return toks

    async def crowded():
        eng = _engine(params, cfg)
        # different co-batch: two unseeded high-temperature streams
        noise = SamplingParams(
            temperature=1.2, max_tokens=30, stop_token_ids=()
        )
        n1 = await eng.submit([9, 10], noise)
        req = await eng.submit([5, 6, 8], sp_seeded)
        n2 = await eng.submit([11, 12], noise)
        toks = [t async for t in req.tokens()]
        _ = [t async for t in n1.tokens()]
        _ = [t async for t in n2.tokens()]
        await eng.close()
        return toks

    a = _run(solo())
    b = _run(crowded())
    assert len(a) >= 3
    assert a == b, f"seeded trace changed with co-batch: {a} vs {b}"

    # two engines, same seed: also identical (engine PRNG not involved)
    async def other_engine_seed():
        eng = _engine(params, cfg, seed=99)
        req = await eng.submit([5, 6, 8], sp_seeded)
        toks = [t async for t in req.tokens()]
        await eng.close()
        return toks

    c = _run(other_engine_seed())
    assert a == c


def test_out_of_range_seeds_fold_into_uint32(params, cfg):
    """Negative or >=2**32 seeds overflowed np.uint32 under NumPy 2 and the
    raised OverflowError killed the engine task (ADVICE r4).  Seeds now
    fold into uint32 range at admission; congruent seeds draw the same
    per-slot key chain."""
    async def go(seed):
        eng = _engine(params, cfg)
        sp = SamplingParams(
            temperature=0.9, max_tokens=6, stop_token_ids=(), seed=seed
        )
        req = await eng.submit([5, 6], sp)
        toks = [t async for t in req.tokens()]
        await eng.close()
        return toks

    assert len(_run(go(-1))) >= 1
    assert len(_run(go(2**40 + 3))) >= 1
    assert _run(go(5)) == _run(go(5 + 2**32))


def test_admission_failure_fails_only_that_request(params, cfg):
    """An exception inside _admit must fail THAT request (closed stream)
    while the engine task keeps serving co-batched traffic — it used to
    crash the loop, stalling every stream and hanging queued clients."""
    async def go():
        eng = _engine(params, cfg)
        orig = eng._admit

        def boom(req):
            if req.prompt_ids == [9, 9]:
                raise RuntimeError("synthetic admission failure")
            return orig(req)

        eng._admit = boom
        sp = SamplingParams(temperature=0.0, max_tokens=5, stop_token_ids=())
        bad = await eng.submit([9, 9], sp)
        good = await eng.submit([5, 6], sp)
        bad_toks = [t async for t in bad.tokens()]
        good_toks = [t async for t in good.tokens()]
        await eng.close()
        return bad_toks, good_toks, bad.done

    bad_toks, good_toks, bad_done = _run(go())
    assert bad_toks == []
    assert bad_done
    assert len(good_toks) >= 1


def test_attn_auto_selects_pallas_for_int8_long_context(params, cfg):
    """attn_impl='auto' routes int8 caches at buckets >= pallas_min_bucket
    to the slot flash kernel ON TPU, and stays dense on CPU/bf16/short
    buckets (DECISIONS r5-007) — 'auto' must actually select (VERDICT r4
    weak #4)."""
    eng = _engine(params, cfg, cache_dtype="int8")
    assert eng._attn_for(None) == "dense"  # CPU test backend
    eng._on_tpu = True
    assert eng._attn_for(2048) == "pallas"
    assert eng._attn_for(4096) == "pallas"
    assert eng._attn_for(512) == "dense"
    bf16 = _engine(params, cfg)
    bf16._on_tpu = True
    assert bf16._attn_for(8192) == "dense"
