"""Training stack: interleaved batching, FSDP step, LoRA, checkpoints."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from project_morpheus_tpu.model import LlamaConfig, init_llama_params, llama_forward
from project_morpheus_tpu.parallel import make_mesh
from project_morpheus_tpu.training import (
    BatchedRatioDataset,
    LoraConfig,
    TrainConfig,
    init_lora_params,
    lora_scale,
    merge_lora,
    pad_collate,
    restore_params,
    save_params,
    shard_for_rank,
    train_loop,
)
from project_morpheus_tpu.training.data import IGNORE_LABEL, PAD_ID
from project_morpheus_tpu.training.lora import make_lora_train_step
from project_morpheus_tpu.training.pretrain import causal_lm_loss, make_optimizer


@pytest.fixture(scope="module")
def cfg():
    return LlamaConfig.tiny_vocab()


@pytest.fixture(scope="module")
def params(cfg):
    return init_llama_params(cfg, jax.random.key(3), dtype=jnp.float32)


def _examples(n, length=12, seed=0, vocab=1000):
    rng = np.random.default_rng(seed)
    return [
        {"input_ids": rng.integers(1, vocab, size=(length,)).tolist()}
        for _ in range(n)
    ]


def test_batched_ratio_dataset_cycle():
    ds = BatchedRatioDataset(_examples(8), _examples(4, seed=1), batch_size=2, ratio=2)
    kinds = [b["kind"] for b in ds]
    assert kinds[:3] == ["text", "text", "audio"]
    assert kinds[3:6] == ["text", "text", "audio"]


def test_shard_for_rank_strided():
    ex = [{"input_ids": [i]} for i in range(10)]
    assert [e["input_ids"][0] for e in shard_for_rank(ex, 1, 4)] == [1, 5, 9]


def test_pad_collate():
    batch = pad_collate(
        [{"input_ids": [1, 2, 3]}, {"input_ids": [4, 5]}], max_len=None
    )
    assert batch["input_ids"].shape == (2, 3)
    assert batch["input_ids"][1, 2] == PAD_ID
    assert batch["labels"][1, 2] == IGNORE_LABEL
    assert batch["attention_mask"].tolist() == [[True] * 3, [True, True, False]]


def test_loss_ignores_pad(cfg, params):
    b1 = pad_collate([{"input_ids": [5, 6, 7, 8]}])
    b2 = pad_collate([{"input_ids": [5, 6, 7, 8]}, {"input_ids": [5, 6, 7, 8, 9, 9]}])
    l1 = causal_lm_loss(params, {k: jnp.asarray(v) for k, v in b1.items()}, cfg)
    assert np.isfinite(float(l1)) and float(l1) > 0


def test_train_loop_reduces_loss(cfg, params):
    # overfit a repeated tiny batch: loss must drop substantially
    ex = _examples(8, length=8, seed=2) * 8
    audio = _examples(8, length=8, seed=3) * 4
    ds = BatchedRatioDataset(ex, audio, batch_size=8, ratio=1)
    tc = TrainConfig(
        learning_rate=3e-3, warmup_steps=2, total_steps=12, seq_len=8, log_every=100
    )
    mesh = make_mesh(model=1)
    new_params, history = train_loop(params, cfg, iter(ds), tc=tc, mesh=mesh)
    losses = history["text_loss"]
    assert len(losses) >= 4
    assert losses[-1] < losses[0]
    assert "audio_loss" in history and history["audio_loss"]


def test_lora_zero_init_is_identity(cfg, params):
    lc = LoraConfig(rank=4)
    lora = init_lora_params(cfg, lc, jax.random.key(0))
    toks = jnp.asarray([[1, 2, 3, 4]])
    base, _ = llama_forward(params, toks, cfg)
    with_lora, _ = llama_forward(
        params, toks, cfg, lora=lora, lora_scale=lora_scale(lc)
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_lora_training_changes_only_adapters(cfg, params):
    import optax

    lc = LoraConfig(rank=4)
    lora = init_lora_params(cfg, lc, jax.random.key(1))
    opt = make_optimizer(TrainConfig(learning_rate=1e-2, warmup_steps=1, total_steps=10))
    step = make_lora_train_step(cfg, lc, opt)
    opt_state = opt.init(lora)
    batch = {k: jnp.asarray(v) for k, v in pad_collate(_examples(2, 8)).items()}
    losses = []
    for _ in range(6):
        lora, opt_state, loss = step(lora, opt_state, params, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # adapters actually moved
    assert float(jnp.abs(lora["layers"]["wq"]["b"]).sum()) > 0


def test_lora_merge_matches_adapter_forward(cfg, params):
    lc = LoraConfig(rank=4)
    lora = init_lora_params(cfg, lc, jax.random.key(2))
    # give B nonzero values so the delta is nontrivial
    lora["layers"]["wq"]["b"] = (
        jax.random.normal(jax.random.key(5), lora["layers"]["wq"]["b"].shape) * 0.01
    )
    toks = jnp.asarray([[7, 8, 9]])
    via_adapter, _ = llama_forward(
        params, toks, cfg, lora=lora, lora_scale=lora_scale(lc)
    )
    merged = merge_lora(params, lora, lc)
    via_merged, _ = llama_forward(merged, toks, cfg)
    np.testing.assert_allclose(
        np.asarray(via_adapter), np.asarray(via_merged), rtol=2e-4, atol=2e-4
    )


def test_checkpoint_roundtrip(cfg, params, tmp_path):
    path = save_params(tmp_path / "ckpt", params, step=7)
    assert "step_7" in path
    restored = restore_params(tmp_path / "ckpt", cfg=cfg, step=7)
    np.testing.assert_array_equal(
        np.asarray(restored["embed"]), np.asarray(params["embed"])
    )


def test_checkpoint_restore_latest_step(cfg, params, tmp_path):
    save_params(tmp_path / "c", params, step=5)
    save_params(tmp_path / "c", jax.tree.map(lambda x: x * 0, params), step=10)
    restored = restore_params(tmp_path / "c", cfg=cfg)  # picks step_10
    assert float(jnp.abs(restored["embed"]).sum()) == 0.0


def test_kill_resume_matches_straight_run(cfg, params, tmp_path):
    """Full trainer-state checkpointing: a run killed after 3 steps and
    resumed finishes with the SAME parameters as an uninterrupted run —
    optimizer moments, LR-schedule step and data cursor all restore
    (reference consolidates full trainer state, pretrain/train.py:128-137).
    """

    def batches():
        ex = _examples(8, length=8, seed=7) * 16
        audio = _examples(8, length=8, seed=8) * 8
        return iter(BatchedRatioDataset(ex, audio, batch_size=8, ratio=1))

    tc = TrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=6, seq_len=8,
        save_steps=3, log_every=100,
    )
    mesh = make_mesh(model=1)

    # uninterrupted 6-step run
    pA, histA = train_loop(params, cfg, batches(), tc=tc, mesh=mesh)

    # killed after 3 steps (saves full state at step 3)...
    import dataclasses

    tc3 = dataclasses.replace(tc, total_steps=3)
    train_loop(params, cfg, batches(), tc=tc3, mesh=mesh,
               checkpoint_dir=str(tmp_path / "run"))
    # ...then resumed for the remaining 3
    logs = []
    pB, histB = train_loop(params, cfg, batches(), tc=tc, mesh=mesh,
                           checkpoint_dir=str(tmp_path / "run"),
                           log=logs.append)
    assert any(rec.get("resumed_at_step") == 3 for rec in logs)
    assert len(histB["text_loss"]) + len(histB["audio_loss"]) == 3

    for a, b in zip(jax.tree.leaves(pA), jax.tree.leaves(pB)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_blockwise_loss_matches_dense(cfg, params):
    batch = {
        k: jnp.asarray(v)
        for k, v in pad_collate(_examples(2, 12, seed=9)).items()
    }
    dense = causal_lm_loss(params, batch, cfg, attn_impl="dense")
    block = causal_lm_loss(params, batch, cfg, attn_impl="blockwise", remat=True)
    np.testing.assert_allclose(float(dense), float(block), rtol=1e-5)


def test_resolve_attn_auto():
    from project_morpheus_tpu.training.pretrain import resolve_attn

    assert resolve_attn(512) == ("dense", False)
    assert resolve_attn(8192) == ("blockwise", True)
    assert resolve_attn(8192, attn_impl="dense", remat="off") == ("dense", False)


def test_chunked_vocab_loss_matches_dense():
    """The chunked-vocab loss (hidden states + per-chunk lm head under
    jax.checkpoint — the seq-8192 HBM posture) must equal the dense loss
    and produce the same gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.pretrain import causal_lm_loss

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, S = 2, 37  # odd length: exercises chunk padding
    ids = rng.integers(5, cfg.vocab_size - 5, size=(B, S))
    labels = ids.copy()
    labels[0, :9] = -100  # ignored span
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((B, S), bool),
        "labels": jnp.asarray(labels, jnp.int32),
    }

    dense, dense_g = jax.value_and_grad(causal_lm_loss)(
        params, batch, cfg, logits_chunk=0
    )
    chunk, chunk_g = jax.value_and_grad(causal_lm_loss)(
        params, batch, cfg, logits_chunk=8
    )
    assert np.allclose(float(dense), float(chunk), rtol=1e-5, atol=1e-6)
    flat_d = jax.tree.leaves(dense_g)
    flat_c = jax.tree.leaves(chunk_g)
    for d, c in zip(flat_d, flat_c):
        np.testing.assert_allclose(np.asarray(d), np.asarray(c),
                                   rtol=2e-4, atol=2e-6)


def test_unrolled_layer_loop_matches_scan():
    """scan_layers=False (single-chip seq-8192 HBM posture: no scan-backward
    double-buffered grad accumulators) must match the scanned loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.pretrain import causal_lm_loss

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(3), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B, S = 2, 33
    ids = rng.integers(5, cfg.vocab_size - 5, size=(B, S))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((B, S), bool),
        "labels": jnp.asarray(ids, jnp.int32),
    }
    l1, g1 = jax.value_and_grad(causal_lm_loss)(
        params, batch, cfg, scan_layers=True, logits_chunk=8, remat=True
    )
    l2, g2 = jax.value_and_grad(causal_lm_loss)(
        params, batch, cfg, scan_layers=False, logits_chunk=8, remat=True
    )
    assert np.allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_grouped_layer_params_loss_matches_canonical():
    """group_layer_params (bounds the scan backward's double-buffered grad
    outputs to one group — the single-chip seq-8192 posture) is exact:
    same loss, same grads after ungrouping."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.pretrain import (
        causal_lm_loss,
        group_layer_params,
        ungroup_layer_params,
    )

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(4), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    B, S = 2, 24
    ids = rng.integers(5, cfg.vocab_size - 5, size=(B, S))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((B, S), bool),
        "labels": jnp.asarray(ids, jnp.int32),
    }
    l1, g1 = jax.value_and_grad(causal_lm_loss)(
        params, batch, cfg, logits_chunk=8, remat=True
    )
    grouped = group_layer_params(params, 2)
    l2, g2 = jax.value_and_grad(causal_lm_loss)(
        grouped, batch, cfg, logits_chunk=8, remat=True
    )
    g2 = ungroup_layer_params(g2)
    assert np.allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    # round trip
    rt = ungroup_layer_params(grouped)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_accum_stack_grads_matches_canonical():
    """The carry-accumulated custom-vjp layer stack (one stacked-gradient
    copy, implicit remat — the single-chip seq-8192 posture) must produce
    the same loss and grads as the scanned stack, for dense and blockwise
    attention."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.pretrain import causal_lm_loss

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(6), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    B, S = 2, 33
    ids = rng.integers(5, cfg.vocab_size - 5, size=(B, S))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((B, S), bool),
        "labels": jnp.asarray(ids, jnp.int32),
    }
    for impl in ("dense", "blockwise"):
        l1, g1 = jax.value_and_grad(causal_lm_loss)(
            params, batch, cfg, attn_impl=impl, logits_chunk=8, remat=True
        )
        l2, g2 = jax.value_and_grad(causal_lm_loss)(
            params, batch, cfg, attn_impl=impl, logits_chunk=8,
            accum_stack_grads=True,
        )
        assert np.allclose(float(l1), float(l2), rtol=1e-6), impl
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)


def test_grouped_grad_step_matches_monolithic():
    """make_grouped_grad_step (K gradient passes at the original params +
    one update — the single-chip 3B/seq-8192 posture) must produce the
    same post-step params as the monolithic step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from project_morpheus_tpu.model import LlamaConfig, init_llama_params
    from project_morpheus_tpu.training.pretrain import (
        group_layer_params,
        make_grouped_grad_step,
        make_train_step,
        ungroup_layer_params,
    )

    cfg = LlamaConfig.tiny_vocab()
    params = init_llama_params(cfg, jax.random.key(8), dtype=jnp.float32)
    params2 = jax.tree.map(jnp.array, params)  # step fns donate inputs
    rng = np.random.default_rng(4)
    B, S = 2, 40
    ids = rng.integers(5, cfg.vocab_size - 5, size=(B, S))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((B, S), bool),
        "labels": jnp.asarray(ids, jnp.int32),
    }

    opt1 = optax.adafactor(learning_rate=1e-4, clipping_threshold=1.0)
    st1 = opt1.init(params)
    p1, _, l1 = make_train_step(cfg, opt1, stack_grad="scan")(
        params, st1, batch
    )

    grouped = group_layer_params(params2, 2)
    opt2 = optax.adafactor(learning_rate=1e-4, clipping_threshold=1.0)
    st2 = opt2.init(grouped)
    p2, _, l2 = make_grouped_grad_step(cfg, opt2, 2)(grouped, st2, batch)
    p2 = ungroup_layer_params(p2)

    assert np.allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-6)
