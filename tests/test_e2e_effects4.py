"""End-to-end ring-modulator and dedicated-output goldens vs the reference.

Closes the round-2 coverage gap: the ring modulator's three carriers
(alc/effects/modulator.cpp:1-224) and the dedicated-dialog routing
(alc/effects/dedicated.cpp:1-123).
"""

import ctypes as ct
import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 44100

AL_EFFECT_RING_MODULATOR = 0x0009
AL_EFFECT_DEDICATED_DIALOGUE = 0x9001
AL_RING_MODULATOR_FREQUENCY = 0x0001
AL_RING_MODULATOR_HIGHPASS_CUTOFF = 0x0002
AL_RING_MODULATOR_WAVEFORM = 0x0003
AL_DEDICATED_GAIN = 0x0001


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


def _render_ref(effect_enum, f_props, i_props, num_frames):
    ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
    try:
        eff = ct.c_uint()
        ref.al.alGenEffects(1, ct.byref(eff))
        ref.al.alEffecti(eff, refdriver.AL_EFFECT_TYPE, effect_enum)
        for param, value in f_props.items():
            ref.al.alEffectf(eff, param, ct.c_float(value))
        for param, value in i_props.items():
            ref.al.alEffecti(eff, param, int(value))
        slot = ct.c_uint()
        ref.al.alGenAuxiliaryEffectSlots(1, ct.byref(slot))
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
        return ref.render(num_frames)
    finally:
        ref.close()


def _compare(name, effect_type, al_props, effect_enum, f_props, i_props,
             frames, tol):
    path = GOLDEN / f"{name}.npz"
    if refdriver.available():
        want = _render_ref(effect_enum, f_props, i_props, frames)
        GOLDEN.mkdir(exist_ok=True)
        np.savez_compressed(path, out=want)
    elif path.exists():
        want = np.load(path)["out"]
    else:
        pytest.skip("no reference library and no cached golden output")
    got = _render_ours(effect_type, al_props, frames)
    err = np.max(np.abs(got - want))
    assert err <= tol, f"max deviation {err:.3e} > {tol:g}"


@pytest.mark.parametrize("wave,wname", [(0, "sin"), (1, "saw"), (2, "square")])
def test_ring_modulator(wave, wname):
    _compare(
        f"fx_modulator_{wname}", "ring_modulator",
        {"frequency": 130.0, "highpass_cutoff": 600.0, "waveform": wave},
        AL_EFFECT_RING_MODULATOR,
        {AL_RING_MODULATOR_FREQUENCY: 130.0,
         AL_RING_MODULATOR_HIGHPASS_CUTOFF: 600.0},
        {AL_RING_MODULATOR_WAVEFORM: wave},
        2 * 8192, 1.0e-4)


def test_dedicated_dialog():
    _compare(
        "fx_dedicated_dialog", "dedicated_dialog",
        {"gain": 0.8},
        AL_EFFECT_DEDICATED_DIALOGUE,
        {AL_DEDICATED_GAIN: 0.8}, {},
        8192, 1.0e-4)
