"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that mesh/pjit/collective code
paths are exercised without TPU hardware (SURVEY.md §4: distributed tests via
``xla_force_host_platform_device_count``).

The environment variables must be set before JAX initializes, hence this file
mutates ``os.environ`` at import time — conftest.py is imported by pytest
before any test module imports jax.
"""

import os

# Force CPU (the ambient environment pins JAX_PLATFORMS to the TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers the TPU-tunnel plugin and pins
# jax_platforms to "axon,cpu" regardless of the env var, so override the
# config directly after import as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiering (VERDICT r3 item #6): the full suite is ~30-55 min; the fast
# lane (`pytest -m "not slow"`) must stay under 15 min. Tests measured >=20 s
# under load (pytest --durations, round-4 full run, 2026-08-19) are listed
# here and marked `slow` centrally — re-derive this list from a fresh
# `pytest --durations=60` run whenever the suite's shape changes materially.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_parallel.py::TestDMSCTDataParallel::test_dmsct_train_step_sharded_matches_local",
    "test_parallel.py::TestMesh::test_dp_train_step_matches_single_device",
    "test_dmsct.py::TestCorrectorMixedPrecision::test_bf16_train_step_updates_and_keeps_f32_params",
    "test_dmsct.py::TestCorrectorMixedPrecision::test_bf16_corrector_tracks_f32_with_shared_weights",
    "test_dmsct.py::TestDMSCTModule::test_train_step_updates_corrector_not_matcher",
    "test_dmsct.py::TestEfficientNet::test_decoder_skip_channels_match_smp",
    "test_dmsct.py::TestEfficientNet::test_feature_pyramid_shapes",
    "test_dmsct.py::TestDMSCTModel::test_forward_shape_and_range",
    "test_parity_sweep.py::TestParitySweep::test_end_to_end_on_fabricated_assets",
    "test_video.py::TestDeepVideoServing::test_dmsct_clip_sharded_matches_eval_forward",
    "test_cli.py::TestCLI::test_fit_then_test_with_checkpoint",
    "test_cli.py::TestCLI::test_validate_subcommand",
    "test_round2_fixes.py::TestEpochAccurateResume::test_resume_continues_epoch",
    "test_round2_fixes.py::TestValidationPanels::test_val_panels_logged_per_split",
    "test_round3_fixes.py::TestNoCheckpointEval::test_classical_validate_with_ckpt_path_does_not_crash",
    "test_round3_fixes.py::TestNoCheckpointEval::test_deep_test_without_ckpt_runs_from_init",
    "test_round3_fixes.py::TestRematConvs::test_remat_matches_no_remat",
    "test_round3_fixes.py::TestDCMCS3DIMixedPrecision::test_bf16_params_stay_f32_and_forward_tracks_f32",
    "test_round3_fixes.py::TestDCMCS3DIMixedPrecision::test_bf16_train_step_finite_and_params_update",
    "test_convert_checkpoints.py::TestSmpOracleB2::test_dmsct_decoder_converter_matches_model",
    "test_convert_checkpoints.py::TestEfficientNetConverter::test_tree_matches_encoder_init",
    "test_harness.py::TestFit::test_one_epoch_and_checkpoint",
    "test_tensor_parallel.py::TestMatcherTP::test_tp_forward_matches_replicated",
    "test_tensor_parallel.py::TestMatcherTP::test_sharding_specs_cover_transformer_matmuls",
    "test_gmflow.py::TestAssembled::test_unimatch_forward_shapes",
    "test_gmflow.py::TestAssembled::test_gmflow_wrapper_bidir_occ",
    "test_gmflow.py::TestComputeDtype::test_bf16_compute_path_close_to_f32",
    "test_bucketing.py::test_masked_heavy_metrics_close",
    "test_bucketing.py::test_bucketed_dcmcs3di_close_to_native",
    "test_checkpoint.py::TestCheckpointManager::test_roundtrip_module_state",
    "test_torch_parity.py::test_gmflow_core_forward_parity",
    "test_predict.py::test_predict_deep_with_model_overrides",
    "test_demo.py::test_demo_classical_panel",
    "test_pasm.py::TestDCMCS3DI::test_loss_and_grads",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # item.nodeid is like "tests/test_x.py::Class::test_y[param]";
        # match on the file::class::name prefix so parameterized tests
        # inherit the mark.
        nodeid = item.nodeid.split("/")[-1].split("[")[0]
        if nodeid in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    A full-suite run in one process accumulates hundreds of XLA:CPU
    executables; at that watermark the compiler segfaulted reproducibly
    (LLVM JIT state, not repo code — the crashing test passes in isolation
    and in any half-suite subset). Clearing the compilation caches between
    modules keeps the per-process compile population bounded. Costs a few
    re-compiles for fixtures shared across modules; measured suite-time
    impact is small because modules rarely share program shapes.
    """
    yield
    import jax

    jax.clear_caches()
