"""C ABI shim: build libopenal_tpu.so and drive it from a C client.

The native/ directory provides the classic OpenAL export surface as a
shared library (embedding CPython over al/api.py); the smoke test is a
plain-C program compiled with the system toolchain that opens a loopback
device, plays a positioned source, and renders — the reference's client
pattern at the ABI level.
"""

import pathlib
import shutil
import subprocess

import pytest

NATIVE = pathlib.Path(__file__).parent.parent / "native"


@pytest.mark.skipif(shutil.which("g++") is None or shutil.which("gcc") is None,
                    reason="no C/C++ toolchain")
def test_build_and_run_c_client():
    subprocess.run(["make", "-C", str(NATIVE)], check=True, timeout=300,
                   capture_output=True)
    proc = subprocess.run([str(NATIVE / "test_shim")], timeout=600,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PEAK=" in proc.stdout and "STREAM_PEAK=" in proc.stdout
