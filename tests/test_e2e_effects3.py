"""Golden tests for the third effect batch: pitch shifter, frequency
shifter, vocal morpher (alc/effects/{pshifter,fshifter,vmorpher}.cpp).

Budgets: pshifter 1e-3 — its synthesis-bin accumulation picks a winning
source bin by comparing magnitudes (pshifter.cpp:308-314), a discontinuous
decision that pffft-vs-XLA FFT rounding occasionally flips when two bins
collide with near-equal magnitudes; the error is bounded by the colliding
bin's magnitude.  fshifter 1e-4 (f32 FFT Hilbert vs the reference's f64),
vmorpher 1e-4 (chunk-parallel SVF reassociation).
"""

import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 44100

AL_EFFECT_FREQUENCY_SHIFTER = 0x0006
AL_EFFECT_VOCAL_MORPHER = 0x0007
AL_EFFECT_PITCH_SHIFTER = 0x0008

AL_FREQUENCY_SHIFTER_FREQUENCY = 0x0001
AL_FREQUENCY_SHIFTER_LEFT_DIRECTION = 0x0002
AL_FREQUENCY_SHIFTER_RIGHT_DIRECTION = 0x0003
AL_VOCAL_MORPHER_PHONEMEA = 0x0001
AL_VOCAL_MORPHER_PHONEMEA_COARSE_TUNING = 0x0002
AL_VOCAL_MORPHER_PHONEMEB = 0x0003
AL_VOCAL_MORPHER_PHONEMEB_COARSE_TUNING = 0x0004
AL_VOCAL_MORPHER_WAVEFORM = 0x0005
AL_VOCAL_MORPHER_RATE = 0x0006
AL_PITCH_SHIFTER_COARSE_TUNE = 0x0001
AL_PITCH_SHIFTER_FINE_TUNE = 0x0002


def _signal(n):
    t = np.arange(n) / RATE
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1230 * t + 0.3))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t)
    return x.astype(np.float32)


def _compare(name, effect_type, al_props, effect_enum, f_props, frames, tol):
    path = GOLDEN / f"{name}.npz"
    data = _signal(RATE // 2)
    if refdriver.available():
        ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
        try:
            eff = refdriver.ct.c_uint()
            ref.al.alGenEffects(1, refdriver.ct.byref(eff))
            ref.al.alEffecti(eff, refdriver.AL_EFFECT_TYPE, effect_enum)
            for param, value in f_props.items():
                if isinstance(value, int):
                    ref.al.alEffecti(eff, param, value)
                else:
                    ref.al.alEffectf(eff, param, refdriver.ct.c_float(value))
            slot = refdriver.ct.c_uint()
            ref.al.alGenAuxiliaryEffectSlots(1, refdriver.ct.byref(slot))
            ref.al.alAuxiliaryEffectSloti(slot, refdriver.AL_EFFECTSLOT_EFFECT,
                                          eff.value)
            buf = ref.gen_buffer()
            ref.buffer_data(buf, refdriver.AL_FORMAT_MONO_FLOAT32, data, RATE)
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
    slot = ctx.create_aux_slot()
    eff = ctx.create_effect(effect_type)
    for k, v in al_props.items():
        eff.set(k, v)
    slot.set_effect(eff)
    b = ctx.create_buffer()
    b.set_data(data, "mono", "float32", RATE)
    src = ctx.create_source()
    src.buffer(b)
    src.looping = True
    src.set("position", (0.7, 0.0, -1.0))
    src.send(slot, 0)
    src.play()
    got = dev.render_samples(frames)
    err = np.max(np.abs(got - want))
    assert err <= tol, f"max deviation {err:.3e} > {tol:g}"


def test_pitch_shifter_send():
    _compare("fx_pshifter", "pitch_shifter",
             {"coarse_tune": 7, "fine_tune": -30},
             AL_EFFECT_PITCH_SHIFTER,
             {AL_PITCH_SHIFTER_COARSE_TUNE: 7, AL_PITCH_SHIFTER_FINE_TUNE: -30},
             2 * 8192, 1.0e-3)


def test_pitch_shifter_down():
    _compare("fx_pshifter_down", "pitch_shifter",
             {"coarse_tune": -9, "fine_tune": 15},
             AL_EFFECT_PITCH_SHIFTER,
             {AL_PITCH_SHIFTER_COARSE_TUNE: -9, AL_PITCH_SHIFTER_FINE_TUNE: 15},
             8192, 1.0e-3)


def test_frequency_shifter_send():
    _compare("fx_fshifter", "frequency_shifter",
             {"frequency": 250.0, "left_direction": 0, "right_direction": 1},
             AL_EFFECT_FREQUENCY_SHIFTER,
             {AL_FREQUENCY_SHIFTER_FREQUENCY: 250.0,
              AL_FREQUENCY_SHIFTER_LEFT_DIRECTION: 0,
              AL_FREQUENCY_SHIFTER_RIGHT_DIRECTION: 1},
             2 * 8192, 1.0e-4)


def test_frequency_shifter_off():
    _compare("fx_fshifter_off", "frequency_shifter",
             {"frequency": 120.0, "left_direction": 2, "right_direction": 0},
             AL_EFFECT_FREQUENCY_SHIFTER,
             {AL_FREQUENCY_SHIFTER_FREQUENCY: 120.0,
              AL_FREQUENCY_SHIFTER_LEFT_DIRECTION: 2,
              AL_FREQUENCY_SHIFTER_RIGHT_DIRECTION: 0},
             8192, 1.0e-4)


def test_vocal_morpher_send():
    _compare("fx_vmorpher", "vocal_morpher",
             {"phoneme_a": 0, "phoneme_b": 4, "phoneme_a_coarse": 0,
              "phoneme_b_coarse": -5, "waveform": 0, "rate": 3.0},
             AL_EFFECT_VOCAL_MORPHER,
             {AL_VOCAL_MORPHER_PHONEMEA: 0, AL_VOCAL_MORPHER_PHONEMEB: 4,
              AL_VOCAL_MORPHER_PHONEMEB_COARSE_TUNING: -5,
              AL_VOCAL_MORPHER_WAVEFORM: 0, AL_VOCAL_MORPHER_RATE: 3.0},
             2 * 8192, 1.0e-4)
