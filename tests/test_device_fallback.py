"""Accelerator-loss fallback: a runtime error mid-render migrates to CPU.

The alu.cpp:2499 disconnect analog: a JaxRuntimeError from the render
dispatch flips the device to XLA:CPU (one-way), re-renders the failed
dispatch from the host mirror, and the stream continues seamlessly.
"""

import numpy as np

import jax

from openal_soft_tpu.alc.device import LoopbackDevice

f32 = np.float32
RATE = 48000


def _scene(dev):
    ctx = dev.create_context()
    t = np.arange(RATE // 2) / RATE
    buf = ctx.create_buffer()
    buf.set_data((0.4 * np.sin(2 * np.pi * 330 * t)).astype(f32),
                 "mono", "float32", RATE)
    src = ctx.create_source()
    src.buffer(buf)
    src.looping = True
    src.set("position", (1.0, 0.0, -1.0))
    src.play()


def test_runtime_error_falls_back_to_cpu():
    # 128-frame dispatches: the T=128 graph compiles on XLA:CPU in
    # seconds (the T=1024 variant takes minutes there).
    ref = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=8)
    _scene(ref)
    want = ref.render_samples(128)

    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=8)
    _scene(dev)
    real_chunk = dev._render_chunk
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError("injected device loss")
        return real_chunk(*args, **kwargs)

    dev._render_chunk = flaky
    got = dev.render_samples(128)
    assert dev._cpu_fallback
    assert calls["n"] == 2   # failed once, re-rendered once
    # CPU vs original-backend renders agree to float tolerance (XLA op
    # fusion differs across backends)
    np.testing.assert_allclose(got, want, atol=2e-5)

    # the stream continues on CPU
    more = dev.render_samples(128)
    assert np.isfinite(more).all() and np.abs(more).max() > 1e-4
