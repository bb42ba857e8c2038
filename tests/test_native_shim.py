"""C ABI shim: build libopenal_tpu.so and drive it from a C client.

The native/ directory provides the classic OpenAL export surface as a
shared library (embedding CPython over al/api.py); the smoke test is a
plain-C program compiled with the system toolchain that opens a loopback
device, plays a positioned source, and renders — the reference's client
pattern at the ABI level.
"""

import os
import pathlib
import shutil
import subprocess

import pytest

NATIVE = pathlib.Path(__file__).parent.parent / "native"


@pytest.mark.skipif(shutil.which("g++") is None or shutil.which("gcc") is None,
                    reason="no C/C++ toolchain")
def test_build_and_run_c_client(tmp_path):
    subprocess.run(["make", "-C", str(NATIVE)], check=True, timeout=300,
                   capture_output=True)
    # Drive the capture scenario against the fake libasound record stream.
    fake = tmp_path / "libfakeasound.so"
    subprocess.run(["gcc", "-shared", "-fPIC", "-O2", "-o", str(fake),
                    str(pathlib.Path(__file__).parent / "fake_alsa.c")],
                   check=True)
    env = dict(os.environ, OPENAL_TPU_ALSA_LIB=str(fake))
    proc = subprocess.run([str(NATIVE / "test_shim")], timeout=600,
                          capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PEAK=" in proc.stdout and "STREAM_PEAK=" in proc.stdout
    assert "CAPTURED=" in proc.stdout and "EAX_DECAY=" in proc.stdout


@pytest.mark.skipif(shutil.which("g++") is None or shutil.which("gcc") is None,
                    reason="no C/C++ toolchain")
def test_export_surface_size():
    """The reference exports 777 entries (alc/export_list.h); ours must
    cover the usable core: >=250 al*/alc*/EAX* dynamic symbols, including
    capture, the source get/set matrix, EAXSet/EAXGet, and Direct
    variants (al/direct_defs.h analog)."""
    subprocess.run(["make", "-C", str(NATIVE)], check=True, timeout=300,
                   capture_output=True)
    out = subprocess.run(["nm", "-D", "--defined-only",
                          str(NATIVE / "libopenal_tpu.so")],
                         capture_output=True, text=True, check=True).stdout
    syms = {line.split()[-1] for line in out.splitlines()
            if " T " in line}
    al_syms = {s for s in syms if s.startswith(("al", "EAX"))}
    assert len(al_syms) >= 250, len(al_syms)
    for required in ("alcCaptureOpenDevice", "alcCaptureSamples",
                     "alGetSourcefv", "alGetListener3f", "alSourceivDirect",
                     "alGetSourceiDirect", "EAXSet", "EAXGet",
                     "alEAXSetBufferMode", "alMapBufferSOFT",
                     "alBufferSubDataSOFT", "alEventCallbackSOFT",
                     "alDebugMessageCallbackEXT", "alGetStringiSOFT"):
        assert required in syms, required
