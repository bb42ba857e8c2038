"""ALSA record path: snd_pcm_readi -> converters -> capture ring.

Drives AlsaCaptureBackend against the fake libasound capture stream
(tests/fake_alsa.c): deterministic int16 frames (a ramp, or the file named
by $FAKE_ALSA_SOURCE), accrued in driver-period chunks per avail_update
poll — the host-side analog of alc/backends/alsa.cpp:900-1100.
"""

import pathlib
import subprocess

import numpy as np
import pytest

HERE = pathlib.Path(__file__).parent
RATE = 44100


@pytest.fixture(scope="module")
def fake_alsa(tmp_path_factory):
    lib = tmp_path_factory.mktemp("alsa") / "libfakeasound.so"
    subprocess.run(["gcc", "-shared", "-fPIC", "-O2",
                    "-o", str(lib), str(HERE / "fake_alsa.c")], check=True)
    return str(lib)


def _reset_lib_cache():
    from openal_soft_tpu.alc import alsa
    alsa._lib_cache = None


@pytest.mark.fast
def test_alsa_capture_ramp(fake_alsa, monkeypatch):
    monkeypatch.setenv("OPENAL_TPU_ALSA_LIB", fake_alsa)
    monkeypatch.delenv("FAKE_ALSA_SOURCE", raising=False)
    _reset_lib_cache()
    from openal_soft_tpu.alc.alsa import AlsaCaptureBackend
    from openal_soft_tpu.alc.capture import CaptureDevice

    backend = AlsaCaptureBackend("default", RATE, "mono")
    dev = CaptureDevice(backend, RATE, "mono", "int16",
                        buffer_frames=4096)
    assert dev.available_samples() == 0      # not started
    dev.start()
    got = np.zeros(0, np.int16)
    while got.size < 1000:
        n = dev.available_samples()
        if n:
            got = np.concatenate([got, dev.capture_samples(n)[:, 0]])
    # The fake serves frame-index ramp samples: 0,1,2,...
    np.testing.assert_array_equal(got[:1000],
                                  np.arange(1000, dtype=np.int16))
    dev.stop()
    backend.close()


@pytest.mark.fast
def test_alsa_capture_from_source_file(fake_alsa, tmp_path, monkeypatch):
    rng = np.random.default_rng(3)
    src = (rng.integers(-30000, 30000, 4096)).astype(np.int16)
    path = tmp_path / "mic.raw"
    path.write_bytes(src.tobytes())
    monkeypatch.setenv("OPENAL_TPU_ALSA_LIB", fake_alsa)
    monkeypatch.setenv("FAKE_ALSA_SOURCE", str(path))
    _reset_lib_cache()
    from openal_soft_tpu.alc.alsa import AlsaCaptureBackend
    from openal_soft_tpu.alc.capture import CaptureDevice

    backend = AlsaCaptureBackend("default", RATE, "mono")
    dev = CaptureDevice(backend, RATE, "mono", "int16",
                        buffer_frames=8192)
    dev.start()
    got = np.zeros(0, np.int16)
    while got.size < 4096:
        n = dev.available_samples()
        if n:
            got = np.concatenate([got, dev.capture_samples(n)[:, 0]])
    np.testing.assert_array_equal(got[:4096], src)
    dev.stop()
    backend.close()


@pytest.mark.fast
def test_alsa_capture_type_conversion(fake_alsa, monkeypatch):
    """int16 wire -> float32 app format goes through the SampleConverter
    oracle (core/converter.py load+store semantics)."""
    monkeypatch.setenv("OPENAL_TPU_ALSA_LIB", fake_alsa)
    monkeypatch.delenv("FAKE_ALSA_SOURCE", raising=False)
    _reset_lib_cache()
    from openal_soft_tpu.alc.alsa import AlsaCaptureBackend
    from openal_soft_tpu.alc.capture import CaptureDevice

    backend = AlsaCaptureBackend("default", RATE, "mono")
    dev = CaptureDevice(backend, RATE, "mono", "float32",
                        buffer_frames=4096)
    dev.start()
    got = np.zeros(0, np.float32)
    while got.size < 512:
        n = dev.available_samples()
        if n:
            got = np.concatenate([got, dev.capture_samples(n)[:, 0]])
    want = np.arange(512, dtype=np.float32) / 32768.0
    np.testing.assert_allclose(got[:512], want, atol=1e-7)
    dev.stop()
    backend.close()


@pytest.mark.fast
def test_capture_open_by_name_routes_to_alsa(fake_alsa, monkeypatch):
    monkeypatch.setenv("OPENAL_TPU_ALSA_LIB", fake_alsa)
    monkeypatch.delenv("FAKE_ALSA_SOURCE", raising=False)
    _reset_lib_cache()
    from openal_soft_tpu.al import api
    from openal_soft_tpu.alc.alsa import AlsaCaptureBackend

    dev = api.alcCaptureOpenDeviceByName("", RATE, 0x1101, 4096)  # MONO16
    assert isinstance(dev.backend, AlsaCaptureBackend)
    api.alcCaptureStart(dev)
    while dev.available_samples() < 256:
        pass
    out = api.alcCaptureSamples(dev, 256)
    assert out.shape == (256, 1)
    np.testing.assert_array_equal(out[:, 0],
                                  np.arange(256, dtype=np.int16))
    api.alcCaptureStop(dev)
    api.alcCaptureCloseDevice(dev)
