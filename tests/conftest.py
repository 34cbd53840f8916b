"""Test config: force CPU with a virtual 8-device mesh.

SURVEY.md §4: the reference has no test suite; we test every op/loss against
golden values and every model forward at tiny shapes, and fake an 8-chip TPU
slice with XLA's host-platform device-count flag (the TPU analog of a fake
backend).
"""

import os

# The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start; the
# jax.config update below (before first backend use) overrides it to CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: re-runs of the suite skip XLA:CPU compiles (the
# suite is compile-dominated on this 1-core host)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# Fast-default selection: compile-heavy tests (>=9s on the 1-core CI host,
# measured via --durations) are marked slow and excluded by pytest.ini's
# `-m "not slow"`. Full suite: `pytest tests/ -m ""`.
# ---------------------------------------------------------------------------

_SLOW_TESTS = {
    "test_convert_hinet.py::test_full_hinet_conversion_parity",
    "test_hooks.py::test_preemption_checkpoint",
    "test_hooks.py::test_tensorboard_hook",
    "test_losses.py::test_bilateral_smooth_loss_grad",
    "test_metrics.py::test_lpips_architecture_and_ordering",
    "test_metrics.py::test_ms_ssim_identical_is_one",
    "test_mixed_precision.py::test_nafnet_bf16_runs",
    "test_models_llie.py::test_zero_dce_loss_and_grads",
    "test_models_llie_wave2.py::test_colie",
    "test_models_llie_wave2.py::test_hvi_cidnet",
    "test_models_llie_wave2.py::test_psenet",
    "test_models_llie_wave2.py::test_retinexformer",
    "test_models_llie_wave2.py::test_rrdnet",
    "test_models_llie_wave2.py::test_rsfnet",
    "test_models_llie_wave2.py::test_ruas",
    "test_models_llie_wave2.py::test_snr",
    "test_models_llie_wave2.py::test_uretinexnet",
    "test_models_llie_wave2.py::test_zero_ig",
    "test_models_llie_wave2.py::test_zid",
    "test_models_llie_wave2.py::test_zero_mie_hsv_d",
    "test_models_multitask.py::test_restormer_forward_and_loss",
    "test_models_multitask.py::test_uformer_forward",
    "test_models_zoo3.py::test_classifier_forward[convnext_tiny]",
    "test_models_zoo3.py::test_classifier_forward[efficientnet_b0]",
    "test_models_zoo3.py::test_classifier_forward[efficientnet_v2_s]",
    "test_models_zoo3.py::test_classifier_forward[mnasnet0_5]",
    "test_models_zoo3.py::test_classifier_forward[mobilenet_v2]",
    "test_models_zoo3.py::test_classifier_forward[regnet_y_400mf]",
    "test_models_zoo3.py::test_classifier_forward[shufflenet_v2_x1_0]",
    "test_models_zoo3.py::test_classifier_forward[squeezenet1_0]",
    "test_models_zoo3.py::test_deeplabv3",
    "test_models_zoo3.py::test_sam_lite_promptable_segmentation",
    "test_models_zoo3.py::test_srno",
    "test_models_zoo3.py::test_swin_forward",
    "test_models_zoo3.py::test_vit_forward",
    "test_models_zoo3.py::test_yolo_lite_detect_and_decode",
    "test_parallel.py::test_halo_exchange_conv_safe",
    "test_parity_reference.py::test_nafnet_reference_parity",
    "test_parity_reference.py::test_retinexformer_reference_parity",
    "test_parity_reference.py::test_snr_reference_parity",
    "test_train_quality.py::test_supervised_training_improves_psnr",
    "test_train_quality.py::test_zero_dce_training_improves_psnr",
    "test_video_and_inpaint.py::test_lama_inpainting",
    "test_cli.py::test_predict_iter_batches",
    "test_models_multitask.py::test_zero_restore_forward_and_loss",
    "test_models_llie_wave2.py::test_lyt_net",
    "test_models_multitask.py::test_mprnet_forward_and_loss",
    "test_models_llie_wave2.py::test_llunetpp",
    "test_models_zoo3.py::test_depth_anything_arch",
    "test_models_multitask.py::test_nafnet_tlc_differs_from_global",
    "test_convert_nafnet.py::test_full_nafnet_conversion_parity",
    "test_hooks.py::test_debug_image_hook",
    "test_infer_engine.py::test_instance_fit_reduces_loss",
    "test_mixed_precision.py::test_zero_dce_bf16_quality_parity",
    "test_models_llie.py::test_gcenet_forward",
    "test_models_llie.py::test_zsn2n_forward_and_loss",
    "test_parity_reference.py::test_uretinexnet_reference_parity",
    "test_niqe.py::test_distortion_ranks_worse",
    "test_niqe.py::test_features_shape",
    "test_parity_reference.py::test_yolov8_reference_parity",
    "test_parity_reference.py::test_llflow_reference_parity",
    "test_parity_reference.py::test_mprnet_reference_parity",
    "test_parity_reference.py::test_uformer_reference_parity",
    "test_parity_reference.py::test_zero_restore_reference_parity[llie]",
    "test_parity_reference.py::test_zero_restore_reference_parity[dehaze]",
    "test_parity_reference.py::test_zero_restore_reference_parity[uie]",
    "test_parity_reference.py::test_zero_ig_reference_parity",
    "test_parity_reference.py::test_psenet_reference_parity",
    "test_parity_reference.py::test_rsfnet_reference_parity",
    "test_parity_reference.py::test_colie_reference_parity",
    "test_parity_reference.py::test_colie_hvi_reference_parity[hvi]",
    "test_parity_reference.py::test_colie_hvi_reference_parity[hvid]",
    "test_parity_reference.py::test_zid_reference_parity",
    "test_parity_reference.py::test_zero_mie_reference_parity[rgb]",
    "test_parity_reference.py::test_zero_mie_reference_parity[hsv_d]",
    "test_parity_reference.py::test_gcenet_reference_parity",
    "test_parity_reference.py::test_zero_dce_v_reference_parity",
    "test_parity_reference.py::test_lama_reference_parity",
    "test_parity_reference.py::test_srno_reference_parity",
    "test_parity_reference.py::test_diinn_reference_parity",
    "test_parity_reference.py::test_depth_anything_v2_reference_parity",
    "test_parity_reference.py::test_sam_reference_parity",
    "test_parity_reference.py::test_rrdnet_reference_parity",
    "test_parity_reference.py::test_neurop_reference_parity",
    "test_parity_reference.py::test_unet_reference_parity",
    "test_models_zoo3.py::test_unet_segmentation",
    "test_models_zoo3.py::test_diinn",
    "test_models_zoo3.py::test_mobile_sam_promptable",
    "test_ops_resize_torch.py::test_bicubic_matches_torch[size0-False]",
    "test_ops_resize_torch.py::test_bicubic_matches_torch[size0-True]",
    "test_models_zoo3.py::test_sam2_lite_video_propagation",
    "test_models_zoo3.py::test_yolov8_param_counts_match_published",
    "test_models_zoo3.py::test_yolov8_detect_track_pipeline",
    "test_models_llie_wave2.py::test_llflow",
    "test_parity_reference.py::test_enlightengan_reference_parity",
    "test_models_llie_wave2.py::test_enlightengan",
    "test_models_llie_wave2.py::test_retinexnet",
    "test_parity_reference.py::test_retinexnet_reference_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
