"""Ambisonic-IR convolution vs the reference (convolution.cpp:484-560).

Two scenarios: a first-order B-Format 3D impulse response with a rotated
listener-orientation property (the 4x4 mixmatrix remap), and a UHJ2 IR
(decoded to B-Format with the FIR512 decoder and mixed through the W/XY
LF-shelving upsample path).
"""

import ctypes as ct
import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 44100

AL_EFFECT_CONVOLUTION_SOFT = 0xA000
AL_CONVOLUTION_ORIENTATION_SOFT = 0x100F
AL_FORMAT_BFORMAT3D_FLOAT32 = 0x20033
AL_FORMAT_UHJ2CHN_FLOAT32_SOFT = 0x19A4

# Rotated orientation: listener looking half-left and tilted.
ORIENT = (-0.6, 0.1, -0.8, 0.05, 1.0, 0.1)


def _tone(n, freq, gain=0.4):
    t = np.arange(n) / RATE
    return (gain * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _ir(n_chan, seed, n_ir=3000):
    rng = np.random.default_rng(seed)
    t = np.arange(n_ir) / RATE
    return (rng.standard_normal((n_ir, n_chan))
            * np.exp(-t * 15.0)[:, None] * 0.4).astype(np.float32)


def _render_ref(ir, fmt, orient, frames):
    ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
    try:
        irbuf = ref.gen_buffer()
        ref.buffer_data(irbuf, fmt, ir, RATE)
        eff = ct.c_uint()
        ref.al.alGenEffects(1, ct.byref(eff))
        ref.al.alEffecti(eff, refdriver.AL_EFFECT_TYPE,
                         AL_EFFECT_CONVOLUTION_SOFT)
        if orient is not None:
            vals = (ct.c_float * 6)(*orient)
            ref.al.alEffectfv(eff, AL_CONVOLUTION_ORIENTATION_SOFT, vals)
        slot = ct.c_uint()
        ref.al.alGenAuxiliaryEffectSlots(1, ct.byref(slot))
        ref.al.alAuxiliaryEffectSloti(slot, refdriver.AL_BUFFER, irbuf)
        ref.al.alAuxiliaryEffectSloti(slot, refdriver.AL_EFFECTSLOT_EFFECT,
                                      eff.value)
        buf = ref.gen_buffer()
        ref.buffer_data(buf, refdriver.AL_FORMAT_MONO_FLOAT32,
                        _tone(RATE // 2, 440.0), RATE)
        src = ref.gen_source()
        ref.source_i(src, refdriver.AL_BUFFER, buf)
        ref.source_i(src, refdriver.AL_LOOPING, 1)
        ref.source_3f(src, refdriver.AL_POSITION, 0.7, 0.0, -1.0)
        refdriver.attach_send(ref, src, slot.value, 0)
        ref.play(src)
        return ref.render(frames)
    finally:
        ref.close()


def _render_ours(ir, channels, orient, frames):
    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=16)
    ctx = dev.create_context()
    irb = ctx.create_buffer()
    irb.set_data(ir, channels, "float32", RATE)
    slot = ctx.create_aux_slot()
    eff = ctx.create_effect("convolution")
    if orient is not None:
        eff.set("orient_at", orient[:3])
        eff.set("orient_up", orient[3:])
    slot.set_effect(eff)
    slot.set_buffer(irb)
    buf = ctx.create_buffer()
    buf.set_data(_tone(RATE // 2, 440.0), "mono", "float32", RATE)
    src = ctx.create_source()
    src.buffer(buf)
    src.looping = True
    src.set("position", (0.7, 0.0, -1.0))
    src.send(slot, 0)
    src.play()
    return dev.render_samples(frames)


def _golden(path, render_ref):
    if refdriver.available():
        want = render_ref()
        GOLDEN.mkdir(exist_ok=True)
        np.savez_compressed(path, out=want)
        return want
    if path.exists():
        return np.load(path)["out"]
    pytest.skip("no reference library and no cached golden output")


def test_convolution_bformat3d_orientation():
    """B-Format 3D IR through the rotated first-order mixmatrix."""
    ir = _ir(4, seed=21)
    frames = 8192
    want = _golden(GOLDEN / "fx_conv_bformat3d.npz",
                   lambda: _render_ref(ir, AL_FORMAT_BFORMAT3D_FLOAT32,
                                       ORIENT, frames))
    got = _render_ours(ir, "bformat3d", ORIENT, frames)
    err = np.max(np.abs(got - want))
    assert err <= 1.0e-4, f"max deviation {err:.3e}"


def test_convolution_uhj2_ir():
    """UHJ2 IR: FIR512 decode at bake + W/XY LF shelving upsample mix."""
    ir = _ir(2, seed=22)
    frames = 8192
    want = _golden(GOLDEN / "fx_conv_uhj2.npz",
                   lambda: _render_ref(ir, AL_FORMAT_UHJ2CHN_FLOAT32_SOFT,
                                       None, frames))
    got = _render_ours(ir, "uhj2", None, frames)
    err = np.max(np.abs(got - want))
    assert err <= 1.0e-4, f"max deviation {err:.3e}"
