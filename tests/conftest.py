"""Test configuration: JAX platform + compilation-cache setup.

Platform policy: the suite runs on whatever JAX's default backend is — on
this machine that is the real TPU via the axon plugin (fast ~30-60 s graph
compiles; note the plugin *overrides* the JAX_PLATFORMS env var at
interpreter startup, so env-var forcing does not work).  Multi-chip
sharding tests build their mesh from ``jax.devices("cpu")`` explicitly —
the virtual 8-device CPU platform registered below coexists with the TPU.

Set OPENAL_CPU_TESTS=1 to force everything onto XLA:CPU (no TPU needed);
full render-graph compiles there take minutes per new graph shape even
with the flags below, but the persistent compilation cache amortizes
across runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's region-analysis copy insertion and concurrency scheduler take
# minutes on the render graph (gather chain + scan); disable both.
if "copy_insertion_use_region_analysis" not in _flags:
    _flags += (" --xla_cpu_copy_insertion_use_region_analysis=false"
               " --xla_cpu_enable_concurrency_optimized_scheduler=false")
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

if os.environ.get("OPENAL_CPU_TESTS") == "1":
    # Must win over the axon plugin's own jax_platforms override; a config
    # update before any backend initializes does.
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: render-graph compiles are seconds (TPU) to
# minutes (CPU); cache them across test processes and runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# --- fast-CI marker -----------------------------------------------------------
# `pytest -m fast` selects a subset for quick sanity: op-level unit tests,
# host-side API/protocol tests, and the light e2e scenarios (small
# capacities, cached goldens).  Measured on this rig (one TPU v5e via the
# axon tunnel): 4m10s warm cache / ~8 min cold (run recorded 2026-08-19;
# see the fast-suite note in ARCHITECTURE.md).  The compile-bound suites
# (chunk invariance, checkpoint/fallback, Pallas unit sweeps, full golden
# e2e) stay unmarked.

_FAST_MODULES = {
    "test_mix", "test_resample", "test_tables", "test_converter",
    "test_bs2b", "test_nfc", "test_output_stage", "test_error_events",
    "test_al_api", "test_debug_ext", "test_eax", "test_hrtf_loader",
    "test_makemhr", "test_native_shim", "test_callback_buffer",
    "test_config_keys", "test_state_carry_fast", "test_pulse",
}


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "fast: quick subset for cold-TPU CI (<10 min)")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _FAST_MODULES:
            item.add_marker(_pytest.mark.fast)
