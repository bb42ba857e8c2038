"""Golden tests for the second effect batch: chorus, flanger, compressor,
distortion, autowah (alc/effects/{chorus,compressor,distortion,autowah}.cpp).

Budgets: chorus/flanger 1e-4 (geometric-doubling feedback reassociation),
compressor/autowah 1e-4 (envelope recurrences in f32), distortion 1e-4
(chunk-parallel biquads at 4x rate).
"""

import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 44100

AL_EFFECT_FLANGER = 0x0005
AL_EFFECT_AUTOWAH = 0x000A
AL_EFFECT_COMPRESSOR = 0x000B

AL_CHORUS_WAVEFORM = 0x0001
AL_CHORUS_PHASE = 0x0002
AL_CHORUS_RATE = 0x0003
AL_CHORUS_DEPTH = 0x0004
AL_CHORUS_FEEDBACK = 0x0005
AL_CHORUS_DELAY = 0x0006
AL_DISTORTION_EDGE = 0x0001
AL_DISTORTION_GAIN = 0x0002
AL_DISTORTION_LOWPASS_CUTOFF = 0x0003
AL_DISTORTION_EQCENTER = 0x0004
AL_DISTORTION_EQBANDWIDTH = 0x0005
AL_COMPRESSOR_ONOFF = 0x0001
AL_AUTOWAH_ATTACK_TIME = 0x0001
AL_AUTOWAH_RELEASE_TIME = 0x0002
AL_AUTOWAH_RESONANCE = 0x0003
AL_AUTOWAH_PEAK_GAIN = 0x0004


def _signal(n):
    t = np.arange(n) / RATE
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1230 * t + 0.3))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t)   # slow AM for envelopes
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


def test_chorus_send():
    _compare("fx_chorus", "chorus",
             {"waveform": 1, "rate": 1.3, "depth": 0.08, "feedback": 0.4,
              "delay": 0.012, "phase": 90},
             refdriver.AL_EFFECT_CHORUS,
             {AL_CHORUS_WAVEFORM: 1, AL_CHORUS_RATE: 1.3,
              AL_CHORUS_DEPTH: 0.08, AL_CHORUS_FEEDBACK: 0.4,
              AL_CHORUS_DELAY: 0.012, AL_CHORUS_PHASE: 90},
             2 * 8192, 1.0e-4)


def test_flanger_send():
    _compare("fx_flanger", "flanger",
             {"waveform": 0, "rate": 0.4, "depth": 0.8, "feedback": -0.45,
              "delay": 0.0022, "phase": 30},
             AL_EFFECT_FLANGER,
             {AL_CHORUS_WAVEFORM: 0, AL_CHORUS_RATE: 0.4,
              AL_CHORUS_DEPTH: 0.8, AL_CHORUS_FEEDBACK: -0.45,
              AL_CHORUS_DELAY: 0.0022, AL_CHORUS_PHASE: 30},
             2 * 8192, 1.0e-4)


def test_compressor_send():
    _compare("fx_compressor", "compressor", {"onoff": True},
             AL_EFFECT_COMPRESSOR, {AL_COMPRESSOR_ONOFF: 1},
             2 * 8192, 1.0e-4)


def test_distortion_send():
    _compare("fx_distortion", "distortion",
             {"edge": 0.4, "gain": 0.1, "lowpass_cutoff": 6000.0,
              "eq_center": 2500.0, "eq_bandwidth": 1500.0},
             refdriver.AL_EFFECT_DISTORTION,
             {AL_DISTORTION_EDGE: 0.4, AL_DISTORTION_GAIN: 0.1,
              AL_DISTORTION_LOWPASS_CUTOFF: 6000.0,
              AL_DISTORTION_EQCENTER: 2500.0,
              AL_DISTORTION_EQBANDWIDTH: 1500.0},
             8192, 1.0e-4)


def test_autowah_send():
    _compare("fx_autowah", "autowah",
             {"attack_time": 0.03, "release_time": 0.15, "resonance": 500.0,
              "peak_gain": 20.0},
             AL_EFFECT_AUTOWAH,
             {AL_AUTOWAH_ATTACK_TIME: 0.03, AL_AUTOWAH_RELEASE_TIME: 0.15,
              AL_AUTOWAH_RESONANCE: 500.0, AL_AUTOWAH_PEAK_GAIN: 20.0},
             8192, 1.0e-4)
