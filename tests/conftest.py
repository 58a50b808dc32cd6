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


# ---------------------------------------------------------------- test tiers
#
# The jit-heavy equivalence gates (full-topology codec parity, training-step
# equality, mesh engine runs, multi-frame byte-equality, ...) dominate the
# suite's ~15 min wall.  They stay in CI's slow tier; the default tier
# (`pytest -q -m "not slow"`) keeps at least one fast probe per subsystem
# and finishes in under two minutes — the driver/pre-commit loop.  Curated
# centrally from `pytest --durations` (>= ~2 s per test) so the tiering is
# data-driven and in one place; param variants inherit their base id's tier.
SLOW_TESTS = {
    "tests/test_adapters.py::test_local_adapter_pull_contract",
    "tests/test_blockwise_attention.py::test_gradients_match_dense",
    "tests/test_blockwise_attention.py::test_llama_forward_blockwise_matches_dense",
    "tests/test_blockwise_attention.py::test_matches_dense",
    "tests/test_chunked_prefill.py::test_batched_chunk_prefill_matches_sequential",
    "tests/test_chunked_prefill.py::test_chunk_kernel_matches_full_forward",
    "tests/test_chunked_prefill.py::test_engine_long_prompt_no_truncation",
    "tests/test_chunked_prefill.py::test_long_prompt_burst_matches_solo_traces",
    "tests/test_engine.py::test_backpressure_gates_saturated_consumer",
    "tests/test_engine.py::test_cancel_frees_slot",
    "tests/test_engine.py::test_generates_until_max_tokens",
    "tests/test_engine.py::test_long_admission_interleaves_chunks_with_frames",
    "tests/test_engine_audio.py::test_audio_request_streams_pcm",
    "tests/test_engine_audio.py::test_fused_frame_pcm_matches_exact_stream_decoder",
    "tests/test_engine_audio.py::test_multiframe_dispatch_pcm_matches_exact_stream_decoder",
    "tests/test_engine_audio.py::test_warmup_precompiles_every_serving_program",
    "tests/test_engine_multistep.py::test_multistep_matches_singlestep_greedy",
    "tests/test_fused_decode.py::test_bucketed_decode_matches_full",
    "tests/test_fused_decode.py::test_fused_int8_matches_separate_int8",
    "tests/test_fused_decode.py::test_fused_weights_match_separate",
    "tests/test_hf_weights.py::test_decode_step_matches_transformers_incremental",
    "tests/test_hf_weights.py::test_load_hf_checkpoint_from_dir",
    "tests/test_hf_weights.py::test_logits_match_transformers",
    "tests/test_kv_quant.py::test_decode_with_int8_cache_tracks_bf16",
    "tests/test_kv_quant.py::test_engine_runs_with_int8_cache",
    "tests/test_kv_quant.py::test_prefill_paths_write_identical_int8",
    "tests/test_llama_model.py::test_decode_step_matches_full_forward",
    "tests/test_multiprocess.py::test_two_process_train_step",
    "tests/test_parallel.py::test_engine_mesh_audio_fused_matches_unsharded",
    "tests/test_parallel.py::test_engine_mesh_matches_unsharded",
    "tests/test_parallel.py::test_engine_runs_on_mesh_tp",
    "tests/test_parallel.py::test_engine_tp_int8_matches_unsharded",
    "tests/test_parallel.py::test_fsdp_forward_matches_unsharded",
    "tests/test_parallel.py::test_tp_decode_step_matches_unsharded",
    "tests/test_parallel.py::test_tp_forward_matches_unsharded",
    "tests/test_server.py::test_speech_e2e_real_jax_tiny_engine",
    "tests/test_snac_parity.py::test_decode_output_shape",
    "tests/test_snac_parity.py::test_full_snac24khz_topology_parity",
    "tests/test_snac_parity.py::test_waveform_allclose_batched",
    "tests/test_snac_parity.py::test_waveform_allclose_vs_oracle",
    "tests/test_stream_decode.py::test_stream_equals_prefix_decode",
    "tests/test_stream_decode.py::test_stream_equals_prefix_decode_full_topology",
    "tests/test_training.py::test_accum_stack_grads_matches_canonical",
    "tests/test_training.py::test_blockwise_loss_matches_dense",
    "tests/test_training.py::test_chunked_vocab_loss_matches_dense",
    "tests/test_training.py::test_grouped_grad_step_matches_monolithic",
    "tests/test_training.py::test_grouped_layer_params_loss_matches_canonical",
    "tests/test_training.py::test_kill_resume_matches_straight_run",
    "tests/test_training.py::test_lora_merge_matches_adapter_forward",
    "tests/test_training.py::test_lora_training_changes_only_adapters",
    "tests/test_training.py::test_lora_zero_init_is_identity",
    "tests/test_training.py::test_loss_ignores_pad",
    "tests/test_training.py::test_train_loop_reduces_loss",
    "tests/test_training.py::test_unrolled_layer_loop_matches_scan",
    "tests/test_training_cli.py::test_lora_cli_saves_merged",
    "tests/test_training_cli.py::test_pretrain_cli",
    # second pass: tests that inherit their module's compile cost once the
    # entries above are deselected (measured with -m "not slow")
    "tests/test_stream_decode.py::test_exact_stream_decoder_matches_prefix_oracle",
    "tests/test_stream_decode.py::test_masked_lane_keeps_state_and_batch_matches_single",
    "tests/test_snac_parity.py::test_output_in_tanh_range",
    "tests/test_engine_audio.py::test_audio_cancel_closes_pcm",
    "tests/test_engine.py::test_concurrent_requests_isolated",
    "tests/test_engine.py::test_pipelined_sequential_requests_clean",
    "tests/test_engine_multistep.py::test_multistep_stop_token_terminates",
    "tests/test_blockwise_attention.py::test_padding_mask",
    "tests/test_stream_planner.py::test_stream_matches_full_decode",
    "tests/test_adapters.py::test_local_adapter_reset_midstream",
    "tests/test_adapters.py::test_remote_sse_retries_then_fails",
    "tests/test_streaming_decoder.py::test_parity_window_selection",
    "tests/test_parallel.py::test_shardings_like_quantized_and_fused",
    "tests/test_quant.py::test_quantized_forward_close",
    "tests/test_fused_decode.py::test_decode_step_writes_cache_in_bounds",
    "tests/test_llama_model.py::test_pallas_attn_impl_matches_dense",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[")[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
