"""EAXReverb golden tests vs the reference loopback (alc/effects/reverb.cpp).

Budget note: the reverb is a recirculating FDN; chunk-parallel state-space
biquads (T60/master filters) differ from the reference's sequential TDF2 by
a few f32 ulps per pass, and the feedback loop recirculates that error at
the T60-controlled decay gain (< 1).  Measured deviation for the default
environment is ~1e-7 over 0.5 s; budget 1e-5 (the north-star target).
"""

import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 48000

AL_EAXREVERB_DENSITY = 0x0001
AL_EAXREVERB_DIFFUSION = 0x0002
AL_EAXREVERB_GAIN = 0x0003
AL_EAXREVERB_GAINHF = 0x0004
AL_EAXREVERB_GAINLF = 0x0005
AL_EAXREVERB_DECAY_TIME = 0x0006
AL_EAXREVERB_DECAY_HFRATIO = 0x0007
AL_EAXREVERB_DECAY_LFRATIO = 0x0008
AL_EAXREVERB_REFLECTIONS_GAIN = 0x0009
AL_EAXREVERB_REFLECTIONS_DELAY = 0x000A
AL_EAXREVERB_LATE_REVERB_GAIN = 0x000C
AL_EAXREVERB_LATE_REVERB_DELAY = 0x000D
AL_EAXREVERB_ECHO_TIME = 0x000F
AL_EAXREVERB_ECHO_DEPTH = 0x0010
AL_EAXREVERB_MODULATION_TIME = 0x0011
AL_EAXREVERB_MODULATION_DEPTH = 0x0012
AL_EAXREVERB_AIR_ABSORPTION_GAINHF = 0x0013
AL_EAXREVERB_HFREFERENCE = 0x0014
AL_EAXREVERB_LFREFERENCE = 0x0015


def _tone(n, freq, gain=0.4):
    t = np.arange(n) / RATE
    return (gain * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _render_ours(al_props, num_frames):
    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=16)
    ctx = dev.create_context()
    slot = ctx.create_aux_slot()
    eff = ctx.create_effect("eaxreverb")
    for k, v in al_props.items():
        eff.set(k, v)
    slot.set_effect(eff)

    buf = ctx.create_buffer()
    buf.set_data(_tone(RATE // 3, 440.0), "mono", "float32", RATE)
    src = ctx.create_source()
    src.buffer(buf)
    src.looping = True
    src.set("position", (0.5, 0.2, -1.0))
    src.send(slot, 0)
    src.play()
    return dev.render_samples(num_frames)


def _render_ref(f_props, num_frames):
    ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=False)
    try:
        slot, _ = refdriver.efx_slot_with_effect(
            ref, refdriver.AL_EFFECT_EAXREVERB, f_props)
        buf = ref.gen_buffer()
        ref.buffer_data(buf, refdriver.AL_FORMAT_MONO_FLOAT32,
                        _tone(RATE // 3, 440.0), RATE)
        src = ref.gen_source()
        ref.source_i(src, refdriver.AL_BUFFER, buf)
        ref.source_i(src, refdriver.AL_LOOPING, 1)
        ref.source_3f(src, refdriver.AL_POSITION, 0.5, 0.2, -1.0)
        refdriver.attach_send(ref, src, slot, 0)
        ref.play(src)
        return ref.render(num_frames)
    finally:
        ref.close()


def _compare(name, al_props, f_props, frames, tol):
    path = GOLDEN / f"{name}.npz"
    if refdriver.available():
        want = _render_ref(f_props, frames)
        GOLDEN.mkdir(exist_ok=True)
        np.savez_compressed(path, out=want)
    elif path.exists():
        want = np.load(path)["out"]
    else:
        pytest.skip("no reference library and no cached golden output")
    got = _render_ours(al_props, frames)
    err = np.max(np.abs(got - want))
    assert err <= tol, f"max deviation {err:.3e} > {tol:g}"


def test_eaxreverb_default():
    """Default EAXReverb params (the 'generic' environment)."""
    _compare("fx_reverb_default", {}, {}, 3 * 8192, 1.0e-5)


def test_eaxreverb_custom():
    """Custom room: density/diffusion/decay + modulation exercised."""
    al_props = {
        "density": 0.35, "diffusion": 0.8, "gain": 0.32, "gain_hf": 0.6,
        "gain_lf": 0.9, "decay_time": 0.9, "decay_hf_ratio": 0.6,
        "decay_lf_ratio": 1.2, "reflections_gain": 0.4,
        "reflections_delay": 0.02, "late_reverb_gain": 0.9,
        "late_reverb_delay": 0.03, "modulation_time": 0.4,
        "modulation_depth": 0.5, "hf_reference": 4000.0,
        "lf_reference": 300.0,
    }
    f_props = {
        AL_EAXREVERB_DENSITY: 0.35, AL_EAXREVERB_DIFFUSION: 0.8,
        AL_EAXREVERB_GAIN: 0.32, AL_EAXREVERB_GAINHF: 0.6,
        AL_EAXREVERB_GAINLF: 0.9, AL_EAXREVERB_DECAY_TIME: 0.9,
        AL_EAXREVERB_DECAY_HFRATIO: 0.6, AL_EAXREVERB_DECAY_LFRATIO: 1.2,
        AL_EAXREVERB_REFLECTIONS_GAIN: 0.4,
        AL_EAXREVERB_REFLECTIONS_DELAY: 0.02,
        AL_EAXREVERB_LATE_REVERB_GAIN: 0.9,
        AL_EAXREVERB_LATE_REVERB_DELAY: 0.03,
        AL_EAXREVERB_MODULATION_TIME: 0.4,
        AL_EAXREVERB_MODULATION_DEPTH: 0.5,
        AL_EAXREVERB_HFREFERENCE: 4000.0, AL_EAXREVERB_LFREFERENCE: 300.0,
    }
    _compare("fx_reverb_custom", al_props, f_props, 3 * 8192, 1.0e-5)
