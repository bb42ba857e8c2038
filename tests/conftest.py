"""Test configuration: force an 8-device virtual CPU platform for JAX.

Multi-chip sharding is validated on a virtual CPU mesh; real-TPU runs happen
via bench.py / the driver's dryrun harness.  Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
