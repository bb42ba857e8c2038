"""End-to-end effect-slot scenarios vs the reference (echo, equalizer)."""

import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 44100


def _tone(n, freq, gain=0.4):
    t = np.arange(n) / RATE
    return (gain * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _render_ours(effect_type, al_props, num_frames):
    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=16)
    ctx = dev.create_context()
    slot = ctx.create_aux_slot()
    eff = ctx.create_effect(effect_type)
    for k, v in al_props.items():
        eff.set(k, v)
    slot.set_effect(eff)

    buf = ctx.create_buffer()
    buf.set_data(_tone(RATE // 2, 440.0), "mono", "float32", RATE)
    src = ctx.create_source()
    src.buffer(buf)
    src.looping = True
    src.set("position", (0.7, 0.0, -1.0))
    src.send(slot, 0)
    src.play()
    return dev.render_samples(num_frames)


def _render_ref(effect_enum, f_props, num_frames):
    ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
    try:
        slot, _ = refdriver.efx_slot_with_effect(ref, effect_enum, f_props)
        buf = ref.gen_buffer()
        ref.buffer_data(buf, refdriver.AL_FORMAT_MONO_FLOAT32,
                        _tone(RATE // 2, 440.0), RATE)
        src = ref.gen_source()
        ref.source_i(src, refdriver.AL_BUFFER, buf)
        ref.source_i(src, refdriver.AL_LOOPING, 1)
        ref.source_3f(src, refdriver.AL_POSITION, 0.7, 0.0, -1.0)
        refdriver.attach_send(ref, src, slot, 0)
        ref.play(src)
        return ref.render(num_frames)
    finally:
        ref.close()


def _compare(name, effect_type, al_props, effect_enum, f_props, frames, tol):
    path = GOLDEN / f"{name}.npz"
    if refdriver.available():
        want = _render_ref(effect_enum, f_props, frames)
        GOLDEN.mkdir(exist_ok=True)
        np.savez_compressed(path, out=want)
    elif path.exists():
        want = np.load(path)["out"]
    else:
        pytest.skip("no reference library and no cached golden output")
    got = _render_ours(effect_type, al_props, frames)
    err = np.max(np.abs(got - want))
    assert err <= tol, f"max deviation {err:.3e} > {tol:g}"


def test_echo_send():
    _compare(
        "fx_echo", "echo",
        {"delay": 0.123, "lr_delay": 0.047, "damping": 0.6,
         "feedback": 0.55, "spread": -0.8},
        refdriver.AL_EFFECT_ECHO,
        {refdriver.AL_ECHO_DELAY: 0.123, refdriver.AL_ECHO_LRDELAY: 0.047,
         refdriver.AL_ECHO_DAMPING: 0.6, refdriver.AL_ECHO_FEEDBACK: 0.55,
         refdriver.AL_ECHO_SPREAD: -0.8},
        3 * 8192, 1.0e-4)


AL_EQ_LOW_GAIN = 0x0001
AL_EQ_LOW_CUTOFF = 0x0002
AL_EQ_MID1_GAIN = 0x0003
AL_EQ_MID1_CENTER = 0x0004
AL_EQ_MID1_WIDTH = 0x0005
AL_EQ_MID2_GAIN = 0x0006
AL_EQ_MID2_CENTER = 0x0007
AL_EQ_MID2_WIDTH = 0x0008
AL_EQ_HIGH_GAIN = 0x0009
AL_EQ_HIGH_CUTOFF = 0x000A


def test_equalizer_send():
    _compare(
        "fx_equalizer", "equalizer",
        {"low_gain": 2.0, "low_cutoff": 180.0, "mid1_gain": 0.4,
         "mid1_center": 700.0, "mid1_width": 0.8, "high_gain": 1.8,
         "high_cutoff": 5500.0},
        refdriver.AL_EFFECT_EQUALIZER,
        {AL_EQ_LOW_GAIN: 2.0, AL_EQ_LOW_CUTOFF: 180.0, AL_EQ_MID1_GAIN: 0.4,
         AL_EQ_MID1_CENTER: 700.0, AL_EQ_MID1_WIDTH: 0.8,
         AL_EQ_HIGH_GAIN: 1.8, AL_EQ_HIGH_CUTOFF: 5500.0},
        8192, 1.0e-4)


def test_convolution_send():
    """Partitioned-convolution reverb vs the reference (BASELINE config 5)."""
    rng = np.random.default_rng(11)
    # A 6000-sample decaying stereo IR (multiple partitions + FIR head).
    n_ir = 6000
    t = np.arange(n_ir) / RATE
    ir = (rng.standard_normal((n_ir, 2)) * np.exp(-t * 12.0)[:, None] * 0.4
          ).astype(np.float32)

    frames = 2 * 8192
    path = GOLDEN / "fx_convolution.npz"
    if refdriver.available():
        ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
        try:
            import ctypes as ct
            AL_EFFECT_CONVOLUTION_SOFT = 0xA000
            irbuf = ref.gen_buffer()
            ref.buffer_data(irbuf, refdriver.AL_FORMAT_STEREO_FLOAT32, ir, RATE)
            eff = ct.c_uint()
            ref.al.alGenEffects(1, ct.byref(eff))
            ref.al.alEffecti(eff, refdriver.AL_EFFECT_TYPE, AL_EFFECT_CONVOLUTION_SOFT)
            slot = ct.c_uint()
            ref.al.alGenAuxiliaryEffectSlots(1, ct.byref(slot))
            ref.al.alAuxiliaryEffectSloti(slot, refdriver.AL_BUFFER, irbuf)
            ref.al.alAuxiliaryEffectSloti(slot, refdriver.AL_EFFECTSLOT_EFFECT, eff.value)
            buf = ref.gen_buffer()
            ref.buffer_data(buf, refdriver.AL_FORMAT_MONO_FLOAT32,
                            _tone(RATE // 2, 440.0), RATE)
            src = ref.gen_source()
            ref.source_i(src, refdriver.AL_BUFFER, buf)
            ref.source_i(src, refdriver.AL_LOOPING, 1)
            ref.source_3f(src, refdriver.AL_POSITION, 0.7, 0.0, -1.0)
            refdriver.attach_send(ref, src, slot.value, 0)
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
    irb = ctx.create_buffer()
    irb.set_data(ir, "stereo", "float32", RATE)
    slot = ctx.create_aux_slot()
    slot.set_buffer(irb)
    eff = ctx.create_effect("convolution")
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
    got = dev.render_samples(frames)
    err = np.max(np.abs(got - want))
    assert err <= 1.0e-4, f"max deviation {err:.3e}"
