"""ALC device lifecycle: routing, pause/resume continuity, reset survival,
the ALSA backend against a fake libasound, and the cross-thread protocol.
"""

import os
import pathlib
import subprocess
import threading
import time

import numpy as np
import pytest

from openal_soft_tpu.alc import lifecycle
from openal_soft_tpu.alc.device import LoopbackDevice

RATE = 48000
HERE = pathlib.Path(__file__).parent


def _tone(n, freq=220.0, gain=0.3):
    t = np.arange(n) / RATE
    return (gain * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _scene(dev_render, n=3):
    ctx = dev_render.create_context() if hasattr(dev_render, "create_context") \
        else None
    return ctx


@pytest.fixture(scope="module")
def fake_alsa(tmp_path_factory):
    lib = tmp_path_factory.mktemp("alsa") / "libfakeasound.so"
    subprocess.run(["gcc", "-shared", "-fPIC", "-O2",
                    "-o", str(lib), str(HERE / "fake_alsa.c")], check=True)
    return str(lib)


def test_route_default_is_null_without_alsa(monkeypatch):
    monkeypatch.setenv("OPENAL_TPU_ALSA_LIB", "/nonexistent/lib.so")
    from openal_soft_tpu.alc import alsa
    alsa._lib_cache = None
    dev = lifecycle.open_device(capacity=16)
    try:
        assert dev.name == lifecycle.NULL_DEVICE_NAME
        assert lifecycle.NULL_DEVICE_NAME in lifecycle.enumerate_devices()
    finally:
        dev.close()


def test_pause_resume_bit_continuity():
    """pause -> resume must continue the stream exactly where it stopped."""
    def build():
        dev = LoopbackDevice(frequency=RATE, channels="stereo",
                             sample_type="float32", capacity=16)
        ctx = dev.create_context()
        buf = ctx.create_buffer()
        buf.set_data(_tone(RATE), "mono", "float32", RATE)
        src = ctx.create_source()
        src.buffer(buf)
        src.looping = True
        src.set("position", (0.5, 0.0, -1.0))
        src.play()
        return dev

    ref = build().render_samples(4096)

    dev = build()
    a = dev.render_samples(1024)
    # The loopback pull model *is* paused between calls; a playback device
    # pauses by stopping the backend thread — either way no state advances.
    b = dev.render_samples(3072)
    got = np.concatenate([a, b], axis=0)
    np.testing.assert_array_equal(got, ref)


def test_playback_pause_resume_and_reset(fake_alsa, tmp_path, monkeypatch):
    monkeypatch.setenv("OPENAL_TPU_ALSA_LIB", fake_alsa)
    cap = tmp_path / "cap.pcm"
    monkeypatch.setenv("FAKE_ALSA_CAPTURE", str(cap))
    from openal_soft_tpu.alc import alsa
    alsa._lib_cache = None
    assert alsa.available()

    dev = lifecycle.open_device(capacity=16)
    assert dev.name == lifecycle.ALSA_DEVICE_NAME
    try:
        # Pause before the context starts the backend so the captured PCM
        # begins exactly at the scene's frame 0 (deterministic comparison).
        dev.pause()
        ctx = dev.create_context()
        buf = ctx.create_buffer()
        buf.set_data(_tone(RATE), "mono", "float32", RATE)
        src = ctx.create_source()
        src.buffer(buf)
        src.looping = True
        src.play()
        dev.resume()
        deadline = time.time() + 30
        while dev.backend.frames_written < 2048 and time.time() < deadline:
            time.sleep(0.05)
        assert dev.backend.frames_written >= 2048

        dev.pause()
        assert dev.state == lifecycle.DeviceState.CONFIGURED
        frames_at_pause = dev.backend.frames_written
        time.sleep(0.2)
        assert dev.backend.frames_written == frames_at_pause
        off_at_pause = src.sample_offset()
        dev.resume()
        deadline = time.time() + 30
        while (dev.backend.frames_written < frames_at_pause + 1024
               and time.time() < deadline):
            time.sleep(0.05)
        assert dev.backend.frames_written > frames_at_pause
        assert src.sample_offset() >= off_at_pause

        # The captured PCM prefix must equal a loopback render of the same
        # scene (deterministic static scene).
        dev.pause()
        data = np.frombuffer(cap.read_bytes(), np.float32)
        frames = data.size // 2
        assert frames >= 2048
        lb = LoopbackDevice(frequency=RATE, channels="stereo",
                            sample_type="float32", capacity=16)
        lctx = lb.create_context()
        lbuf = lctx.create_buffer()
        lbuf.set_data(_tone(RATE), "mono", "float32", RATE)
        lsrc = lctx.create_source()
        lsrc.buffer(lbuf)
        lsrc.looping = True
        lsrc.play()
        want = lb.render_samples(min(frames, 4096))
        got = data[: want.size].reshape(-1, 2)
        np.testing.assert_array_equal(got, want)

        # Reset with voice survival: the source keeps playing afterward.
        dev.resume()
        dev.reset()
        assert src.state == "playing"
        deadline = time.time() + 30
        base = dev.backend.frames_written
        while dev.backend.frames_written < base + 1024 and time.time() < deadline:
            time.sleep(0.05)
        assert dev.backend.frames_written > base

        # Reopen onto the null backend.
        dev.reopen(lifecycle.NULL_DEVICE_NAME)
        assert dev.name == lifecycle.NULL_DEVICE_NAME
        assert dev.state == lifecycle.DeviceState.PLAYING
    finally:
        dev.close()


def test_threaded_param_stress(fake_alsa, tmp_path, monkeypatch):
    """App thread hammers param writes + play/stop while the backend mixer
    thread renders: the device lock must keep the tables consistent (no
    exceptions, no row leaks)."""
    monkeypatch.setenv("OPENAL_TPU_ALSA_LIB", fake_alsa)
    monkeypatch.setenv("FAKE_ALSA_CAPTURE", str(tmp_path / "s.pcm"))
    from openal_soft_tpu.alc import alsa
    alsa._lib_cache = None

    dev = lifecycle.open_device(capacity=64)
    try:
        ctx = dev.create_context()
        buf = ctx.create_buffer()
        buf.set_data(_tone(RATE), "mono", "float32", RATE)
        srcs = []
        for i in range(8):
            src = ctx.create_source()
            src.buffer(buf)
            src.looping = True
            src.play()
            srcs.append(src)
        errors = []

        def hammer():
            rng = np.random.default_rng(0)
            try:
                for i in range(400):
                    s = srcs[i % len(srcs)]
                    s.set("position", tuple(rng.standard_normal(3)))
                    s.set("gain", float(rng.uniform(0.1, 1.0)))
                    if i % 50 == 49:
                        s.stop()
                        s.play()
            except Exception as e:   # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=hammer) for _ in range(3)]
        base = dev.backend.frames_written
        for t in threads:
            t.start()
        for t in threads:
            t.join(60)
        deadline = time.time() + 30
        while dev.backend.frames_written < base + 4096 and time.time() < deadline:
            time.sleep(0.05)
        assert not errors, errors
        assert dev.backend.frames_written >= base + 4096
        # No voice-row leaks: stopped voices return their rows.
        for s in srcs:
            s.stop()
        for _ in range(4):
            dev.render.render_samples(1024)
        used = dev.render.capacity - len(dev.render._free_rows)
        assert used == 0
    finally:
        dev.close()
