"""Test configuration: force an 8-device virtual CPU mesh.

This is the JAX-standard substitute for a fake distributed backend (the
reference had neither tests nor multi-node support — SURVEY §4): all
multi-device sharding paths are exercised on 8 virtual CPU devices via
``--xla_force_host_platform_device_count=8``.

Env vars MUST be set before jax initializes its backends, hence module level.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the TPU tunnel sets its own platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# sitecustomize may have imported jax before this file ran, latching the env;
# jax.config.update overrides the latched value (backends are still lazy).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-bound on this 1-core VM
# (every test re-jits the same 8-device programs); caching compiled
# executables across runs/processes is the same lever the serving CLI ships
# as --eval.compile_cache (measured 100s -> 17s there). Key'd by program
# fingerprint, so cross-run reuse is sound. Opt out: KEMR_TEST_CACHE=0.
if os.environ.get("KEMR_TEST_CACHE", "1") != "0":
    _cache_dir = os.environ.get(
        "KEMR_TEST_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), ".jax_test_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


# ---------------------------------------------------------------------------
# Fast lane: auto-mark the heavy tests slow (VERDICT r3 #2)
# ---------------------------------------------------------------------------
# `python -m pytest tests/ -m "not slow"` is the enforced core subset for
# the 1-core build VM; the FULL suite stays the completeness gate. Heavy =
# measured >= ~12 s per test here (mostly full train-loop drills that
# compile multi-step programs). Centralized so a durations re-measure is a
# one-list edit; each heavy area keeps at least one cheap sentinel in the
# fast lane (e.g. test_train_step_reduces_loss for the trainer).

_HEAVY_MODULES = {
    "test_gradcache", "test_fsdp", "test_hard_negatives", "test_distill",
    "test_multislice", "test_qat", "test_flip_masking", "test_preemption",
}
_HEAVY_TESTS = {
    "test_dryrun_multichip_fresh_process_no_env_help",
    "test_dryrun_multichip_in_process",
    "test_sp_block_grads_flow",
    "test_ring_grads_match_dense",
    "test_clip_trainer_tensor_parallel",
    "test_gspmd_step_matches_dp_global_negatives",
    "test_grad_accum_matches_larger_batch_semantics",
    "test_ema_rides_the_gspmd_step",
    "test_ema_matches_manual_recurrence",
    "test_ema_eval_and_checkpoint_serve_the_shadow",
    "test_logit_scale_untouched_by_training",
    "test_freeze_encoders_only_projections_move",
    "test_resume_restores_epoch_and_params",
    "test_trainer_step_descends_with_mrl",
    "test_cli_train_smoke",
    "test_cli_train_lora_saves_best_adapters",
    "test_lora_trainer_reduces_loss_and_freezes_base",
    "test_lora_trainer_epoch_checkpoint_resume",
    "test_trainer_siglip_step_reduces_loss",
    "test_heads_trainable",
    "test_clip_retrieval_ivf_composes_with_int8_and_sharding",
    "test_pipeline_grads_match_sequential",
    "test_encode_text_fast_int8_plan",
    # second tier (r4 durations re-measure): each area keeps a sentinel —
    # trainer: test_train_step_reduces_loss; ann: test_clip_retrieval_ivf_mode;
    # ep: test_moe_matches_loop_oracle; sp: test_ring_matches_dense;
    # pp: test_pipeline_matches_sequential; parity: ..._requires_checkpoint;
    # cli: serve_local_kg + evaluate_end_to_end stay fast
    "test_epoch_metrics_are_means_not_last_step",
    "test_parity_dry_run_writes_report",
    "test_clip_retrieval_ivfpq_mode",
    "test_clip_retrieval_ivf_int4_mode",
    "test_cli_export_roundtrip",
    "test_pipeline_real_clip_blocks",
    "test_cli_train_fusion_and_serve_head",
    "test_cli_serve_encoder_modes",
    "test_expert_sharded_matches_unsharded",
    "test_global_negatives_step_runs",
    "test_full_train_loop_with_val_and_checkpoints",
    "test_sp_block_matches_residual_block",
    "test_moe_grads_flow",
    "test_ring_order_invariance_small_ring",
}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        base = item.nodeid.split("::")[0].rsplit("/", 1)[-1].removesuffix(".py")
        name = item.name.split("[")[0]
        if base in _HEAVY_MODULES or name in _HEAVY_TESTS:
            item.add_marker(slow)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
