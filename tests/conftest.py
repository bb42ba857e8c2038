"""Test configuration: force an 8-device virtual CPU platform for JAX.

Multi-chip sharding is validated on a virtual CPU mesh; real-TPU runs happen
via bench.py / the driver's dryrun harness.  Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's region-analysis copy insertion and concurrency scheduler take
# minutes on the render graph (gather chain + scan); disable both for tests.
if "copy_insertion_use_region_analysis" not in _flags:
    _flags += (" --xla_cpu_copy_insertion_use_region_analysis=false"
               " --xla_cpu_enable_concurrency_optimized_scheduler=false")
os.environ["XLA_FLAGS"] = _flags.strip()
