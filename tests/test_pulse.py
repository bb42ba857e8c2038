"""PulseAudio backend: blocking-write playback + record-thread capture.

Drives PulseBackend / PulseCaptureBackend against the fake
libpulse-simple (tests/fake_pulse.c): playback asserts the exact PCM
byte stream the mixer loop produced; capture asserts the ramp / source
frames flow through the converter stack — the host-side analog of
alc/backends/pulseaudio.cpp.
"""

import pathlib
import subprocess
import time

import numpy as np
import pytest

HERE = pathlib.Path(__file__).parent
RATE = 44100


@pytest.fixture(scope="module")
def fake_pulse(tmp_path_factory):
    lib = tmp_path_factory.mktemp("pulse") / "libfakepulse.so"
    subprocess.run(["gcc", "-shared", "-fPIC", "-O2",
                    "-o", str(lib), str(HERE / "fake_pulse.c")], check=True)
    return str(lib)


def _reset_lib_cache():
    from openal_soft_tpu.alc import pulse
    pulse._lib_cache = None


@pytest.mark.fast
def test_pulse_playback_stream(fake_pulse, tmp_path, monkeypatch):
    cap = tmp_path / "stream.raw"
    monkeypatch.setenv("OPENAL_TPU_PULSE_LIB", fake_pulse)
    monkeypatch.setenv("FAKE_PULSE_CAPTURE", str(cap))
    _reset_lib_cache()
    from openal_soft_tpu.alc import pulse

    assert pulse.available()

    class FakeRender:
        from openal_soft_tpu.core.devformat import DevFmtType
        fmt_type = DevFmtType.SHORT
        sample_rate = RATE
        n_real = 2

        def __init__(self):
            self.cursor = 0

        def render_samples(self, n):
            t = np.arange(self.cursor, self.cursor + n)
            self.cursor += n
            return np.stack([t, -t], axis=1).astype(np.int16)

        def handle_disconnect(self, msg):
            raise AssertionError(msg)

    dev = FakeRender()
    be = pulse.PulseBackend(dev)
    be.start(period_frames=256)
    deadline = time.time() + 5.0
    while be.frames_written < 1024 and time.time() < deadline:
        time.sleep(0.01)
    be.close()
    raw = np.frombuffer(cap.read_bytes(), np.int16).reshape(-1, 2)
    assert raw.shape[0] >= 1024
    t = np.arange(raw.shape[0])
    np.testing.assert_array_equal(raw[:, 0], t.astype(np.int16))
    np.testing.assert_array_equal(raw[:, 1], (-t).astype(np.int16))


@pytest.mark.fast
def test_pulse_capture_ramp(fake_pulse, monkeypatch):
    monkeypatch.setenv("OPENAL_TPU_PULSE_LIB", fake_pulse)
    monkeypatch.delenv("FAKE_PULSE_SOURCE", raising=False)
    _reset_lib_cache()
    from openal_soft_tpu.alc.capture import CaptureDevice
    from openal_soft_tpu.alc.pulse import PulseCaptureBackend

    backend = PulseCaptureBackend(None, RATE, "mono")
    dev = CaptureDevice(backend, RATE, "mono", "int16",
                        buffer_frames=8192)
    dev.start()
    got = np.zeros(0, np.int16)
    deadline = time.time() + 5.0
    while got.size < 1000 and time.time() < deadline:
        n = dev.available_samples()
        if n:
            got = np.concatenate([got, dev.capture_samples(n)[:, 0]])
    dev.stop()
    backend.close()
    assert got.size >= 1000
    np.testing.assert_array_equal(got[:1000],
                                  np.arange(1000, dtype=np.int16))


@pytest.mark.fast
def test_pulse_capture_source_file(fake_pulse, tmp_path, monkeypatch):
    rng = np.random.default_rng(5)
    src = rng.integers(-30000, 30000, 4096).astype(np.int16)
    path = tmp_path / "src.raw"
    path.write_bytes(src.tobytes())
    monkeypatch.setenv("OPENAL_TPU_PULSE_LIB", fake_pulse)
    monkeypatch.setenv("FAKE_PULSE_SOURCE", str(path))
    _reset_lib_cache()
    from openal_soft_tpu.alc.pulse import PulseCaptureBackend

    backend = PulseCaptureBackend(None, RATE, "mono")
    backend.start()
    got = np.zeros(0, np.int16)
    deadline = time.time() + 5.0
    while got.size < 4096 and time.time() < deadline:
        n = backend.available()
        if n:
            got = np.concatenate([got, backend.read(n)[:, 0]])
    backend.close()
    np.testing.assert_array_equal(got[:4096], src)
