"""B-Format and UHJ source golden tests vs the reference loopback.

Covers the ambisonic source path (CalcAmbisonicPanning, alu.cpp:911-1076)
and the UHJ decoders (core/uhjfilter.cpp): rotation panning of B-Format
buffers, and the FIR256 phase-shift decode of UHJ2 buffers with the
UHJ2-specific LF shelving (core/voice.cpp:1290-1317).
"""

import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 48000

AL_FORMAT_BFORMAT3D_FLOAT32 = 0x20033
AL_FORMAT_UHJ2CHN_FLOAT32_SOFT = 0x19A4
AL_FORMAT_UHJ4CHN_FLOAT32_SOFT = 0x19AA


def _bformat_signal(n):
    """A first-order scene: two tones panned to different directions."""
    t = np.arange(n) / RATE
    s1 = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    s2 = (0.2 * np.sin(2 * np.pi * 700 * t + 0.5)).astype(np.float32)
    # FuMa W/X/Y/Z encoding of sources at 45deg and behind-left.
    w = (s1 + s2) * np.float32(1.0 / np.sqrt(2.0))
    x = s1 * np.float32(np.cos(np.pi / 4)) - s2 * np.float32(0.7)
    y = s1 * np.float32(np.sin(np.pi / 4)) + s2 * np.float32(0.6)
    z = 0.1 * s2
    return np.stack([w, x, y, z], axis=1).ravel().astype(np.float32)


def _uhj_signal(n, chans):
    rng = np.random.default_rng(5)
    t = np.arange(n) / RATE
    base = [0.3 * np.sin(2 * np.pi * 330 * t),
            0.25 * np.sin(2 * np.pi * 550 * t + 1.0),
            0.15 * np.sin(2 * np.pi * 850 * t + 2.0),
            0.1 * np.sin(2 * np.pi * 1250 * t + 3.0)]
    return np.stack(base[:chans], axis=1).ravel().astype(np.float32)


def _compare(name, data, our_fmt, ref_fmt, frames, tol, position=(0.4, 0.1, -1.0)):
    path = GOLDEN / f"{name}.npz"
    if refdriver.available():
        ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
        try:
            buf = ref.gen_buffer()
            ref.buffer_data(buf, ref_fmt, data, RATE)
            src = ref.gen_source()
            ref.source_i(src, refdriver.AL_BUFFER, buf)
            ref.source_i(src, refdriver.AL_LOOPING, 1)
            ref.source_3f(src, refdriver.AL_POSITION, *position)
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
                         sample_type="float32", capacity=16)
    ctx = dev.create_context()
    b = ctx.create_buffer()
    b.set_data(data, our_fmt, "float32", RATE)
    src = ctx.create_source()
    src.buffer(b)
    src.looping = True
    src.set("position", position)
    src.play()
    got = dev.render_samples(frames)
    err = np.max(np.abs(got - want))
    assert err <= tol, f"max deviation {err:.3e} > {tol:g}"


def test_bformat3d_source():
    _compare("src_bformat3d", _bformat_signal(RATE // 4), "bformat3d",
             AL_FORMAT_BFORMAT3D_FLOAT32, 2 * 8192, 1.0e-5)


def test_bformat3d_oriented():
    """Rotation path: a non-default source orientation."""
    data = _bformat_signal(RATE // 4)
    path = GOLDEN / "src_bformat3d_rot.npz"
    orient = (0.5, 0.1, -0.8, 0.0, 1.0, 0.1)
    if refdriver.available():
        ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
        try:
            buf = ref.gen_buffer()
            ref.buffer_data(buf, AL_FORMAT_BFORMAT3D_FLOAT32, data, RATE)
            src = ref.gen_source()
            ref.source_i(src, refdriver.AL_BUFFER, buf)
            ref.source_i(src, refdriver.AL_LOOPING, 1)
            ref.source_3f(src, refdriver.AL_POSITION, 0.4, 0.1, -1.0)
            arr = (refdriver.ct.c_float * 6)(*orient)
            ref.al.alSourcefv(src, refdriver.AL_ORIENTATION, arr)
            ref.play(src)
            want = ref.render(8192)
        finally:
            ref.close()
        GOLDEN.mkdir(exist_ok=True)
        np.savez_compressed(path, out=want)
    elif path.exists():
        want = np.load(path)["out"]
    else:
        pytest.skip("no reference library and no cached golden output")

    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=16)
    ctx = dev.create_context()
    b = ctx.create_buffer()
    b.set_data(data, "bformat3d", "float32", RATE)
    src = ctx.create_source()
    src.buffer(b)
    src.looping = True
    src.set("position", (0.4, 0.1, -1.0))
    src.set("orient_at", orient[:3])
    src.set("orient_up", orient[3:])
    src.play()
    got = dev.render_samples(8192)
    err = np.max(np.abs(got - want))
    assert err <= 1.0e-5, f"max deviation {err:.3e}"


def test_uhj2_source():
    _compare("src_uhj2", _uhj_signal(RATE // 4, 2), "uhj2",
             AL_FORMAT_UHJ2CHN_FLOAT32_SOFT, 2 * 8192, 1.0e-5)


def test_uhj4_source():
    _compare("src_uhj4", _uhj_signal(RATE // 4, 4), "uhj4",
             AL_FORMAT_UHJ4CHN_FLOAT32_SOFT, 2 * 8192, 1.0e-5)
