"""Output-stage golden tests: limiter + dither + int16 quantization.

The reference enables the mastering limiter and 16-bit dither for int16
output (alc/alc.cpp:1677-1763); Write<i16> rounds nearest-even after
clamping.  With the bit-exact dither LCG and the same limiter automation,
our int16 loopback output should match the reference within 1 LSB
(float rounding at round-to-nearest boundaries).
"""

import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice
from openal_soft_tpu.core import mastering

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 48000


def _tone(n, freq, gain):
    t = np.arange(n) / RATE
    return (gain * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_int16_output_stage():
    frames = 3 * 4096
    # A hot source so the limiter actually engages.
    data = _tone(RATE // 4, 300.0, 1.4)
    path = GOLDEN / "int16_limited.npz"
    if refdriver.available():
        ref = refdriver.RefLoopback(RATE, "stereo", "int16")
        try:
            buf = ref.gen_buffer()
            ref.buffer_data(buf, refdriver.AL_FORMAT_MONO_FLOAT32, data, RATE)
            src = ref.gen_source()
            ref.source_i(src, refdriver.AL_BUFFER, buf)
            ref.source_i(src, refdriver.AL_LOOPING, 1)
            ref.source_3f(src, refdriver.AL_POSITION, 0.3, 0.0, -1.0)
            ref.play(src)
            want = ref.render(frames)
        finally:
            ref.close()
        GOLDEN.mkdir(exist_ok=True)
        np.savez_compressed(path, out=want)
    elif path.exists():
        want = np.load(path)["out"]
    else:
        pytest.skip("no reference library and no cached golden output")

    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="int16", capacity=16)
    ctx = dev.create_context()
    buf = ctx.create_buffer()
    buf.set_data(data, "mono", "float32", RATE)
    src = ctx.create_source()
    src.buffer(buf)
    src.looping = True
    src.set("position", (0.3, 0.0, -1.0))
    src.play()
    got = dev.render_samples(frames)

    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, f"max int16 deviation {diff.max()} LSB"
    # The limiter must actually have engaged for this to mean anything.
    assert np.abs(want).max() >= 32000


def test_py_limiter_matches_native():
    if mastering._get_lib() is None:
        pytest.skip("native limiter unavailable")
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((4096, 2)) * 0.9).astype(np.float32)
    a = np.ascontiguousarray(x.copy())
    b = x.copy()
    nat = mastering.Limiter(2, 48000.0, -0.1)
    assert nat._lib is not None
    py = mastering._PyLimiter(2, 48000.0, -0.1)
    for i in range(0, 4096, 1024):
        nat.process(a[i:i + 1024])
        py.process(b[i:i + 1024])
    # The Python fallback computes the gain recurrence in float64; the
    # native path (like the reference) is float32.  Gains hover near 1, so
    # a relative bound of ~1e-3 is the expected precision gap.
    assert np.abs(a - b).max() < 2e-3


def test_dither_deterministic():
    d1 = mastering.DitherState(16)
    d2 = mastering.DitherState(16)
    x = np.zeros((1024, 2), np.float32) + 0.25
    o1 = d1.apply(x)
    o2 = d2.apply(x)
    assert np.array_equal(o1, o2)
    # Sequence advances: a second block differs from the first.
    o3 = d1.apply(x)
    assert not np.array_equal(o1, o3)
