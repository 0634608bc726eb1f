"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-node without a cluster": XLA hosts N
virtual CPU devices so sharding/collective code paths execute for real.
Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

# The axon (remote TPU tunnel) PJRT plugin registered by sitecustomize routes
# compilation through a relay and slows CPU tests ~15x. Deregister it before
# any backend initializes; tests run purely on host CPU devices.
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
    _xb._backends.clear()
except Exception:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# persistent compilation cache: repeated test runs reuse compiled
# executables instead of re-tracing the full detectors each time
try:
    import jax as _jax_cache

    _cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                "/tmp/simpledet_jax_cache_cpu")
    os.makedirs(_cache_dir, exist_ok=True)
    _jax_cache.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax_cache.config.update("jax_persistent_cache_min_compile_time_secs",
                             1.0)
except Exception:
    pass


# ---------------------------------------------------------------------------
# slow/fast lanes: tests measured >=9s on the CPU mesh get the `slow` marker
# automatically; run the fast lane with `pytest tests/ -m "not slow"`.
# Whole files here are slow because of expensive module fixtures.
SLOW_FILES = {
    "test_e2e_train_eval.py",
}
SLOW_TESTS = {
    "test_aux.py::test_cosine_schedule_config",
    "test_aux.py::test_remat_train_step_matches",
    "test_aux.py::test_auto_resume",
    "test_aux.py::test_rpn_test_cli",
    "test_aux2.py::test_infer_speed_cli",
    "test_aux2.py::test_int8_micro_config_trains",
    "test_aux2.py::test_syncbn_micro_train_then_eval",
    "test_cascade.py::test_cascade_train_and_test",
    "test_coco_eval_parity.py::test_cocoeval_5k_images_fast",
    "test_deform_conv.py::test_dcn_backbone_smoke",
    "test_fcos.py::test_fcos_e2e_train_test",
    "test_freeanchor_crowd.py::test_crowdhuman_e2e_tiny",
    "test_freeanchor_crowd.py::test_freeanchor_loss_tiny",
    "test_mask.py::test_mask_e2e_train_and_segm_eval",
    "test_mesh_eval.py::test_mesh_sharded_eval_byte_identical",
    "test_msrcnn_kd.py::test_msrcnn_e2e_tiny",
    "test_msrcnn_kd.py::test_kd_fitnet_tiny",
    "test_multiscale_test.py::test_multiscale_flip_eval",
    "test_necks_backbones.py::test_efficientnet_backbone",
    "test_necks_backbones.py::test_fpg_faster_e2e",
    "test_necks_backbones.py::test_retina_with_nasfpn_e2e",
    "test_necks_backbones.py::test_se_backbone_and_mask_head",
    "test_necks_backbones.py::test_pafpn_and_fpg_neck_shapes",
    "test_reppoints.py::test_reppoints_e2e_tiny",
    "test_retinanet.py::test_retinanet_train_and_test_step",
    "test_roi_align.py::test_pallas_roi_align_matches_crop_path",
    "test_sepc.py::test_sepc_retina_e2e",
    "test_trident.py::test_trident_e2e_tiny",
    "test_trident.py::test_trident_mask_e2e_tiny",
    "test_tsd.py::test_tsd_e2e_tiny",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[")[0]
        if fname in SLOW_FILES or f"{fname}::{base}" in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
