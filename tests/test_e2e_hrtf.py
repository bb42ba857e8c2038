"""End-to-end binaural HRTF render vs the reference (config 2 of BASELINE).

Uses the same SADIE-derived default HRTF data set the reference embeds
(read from the reference tree at golden-generation time; goldens cached)."""

import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"
RATE = 48000  # matches the default HRTF set → no HRTF resampling


def _tone(n, freq, gain=0.4):
    t = np.arange(n) / RATE
    return (gain * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _render_ours(scenario, num_frames):
    dev = LoopbackDevice(frequency=RATE, channels="stereo", sample_type="float32",
                         capacity=64, hrtf=True)
    ctx = dev.create_context()
    for s in scenario:
        buf = ctx.create_buffer()
        buf.set_data(s["data"], "mono", "float32", s.get("buf_rate", RATE))
        src = ctx.create_source()
        src.buffer(buf)
        src.looping = s.get("looping", True)
        for k, v in s.get("props", {}).items():
            src.set(k, v)
        src.play()
    return dev.render_samples(num_frames)


def _render_ref(scenario, num_frames):
    ref = refdriver.RefLoopback(RATE, "stereo", "float32", hrtf=True)
    try:
        for s in scenario:
            buf = ref.gen_buffer()
            ref.buffer_data(buf, refdriver.AL_FORMAT_MONO_FLOAT32,
                            s["data"], s.get("buf_rate", RATE))
            src = ref.gen_source()
            ref.source_i(src, refdriver.AL_BUFFER, buf)
            if s.get("looping", True):
                ref.source_i(src, refdriver.AL_LOOPING, 1)
            props = s.get("props", {})
            if "position" in props:
                ref.source_3f(src, refdriver.AL_POSITION, *props["position"])
            if "gain" in props:
                ref.source_f(src, refdriver.AL_GAIN, props["gain"])
            if "pitch" in props:
                ref.source_f(src, refdriver.AL_PITCH, props["pitch"])
            ref.play(src)
        return ref.render(num_frames)
    finally:
        ref.close()


def _golden_compare(name, scenario, num_frames, tol):
    path = GOLDEN / f"{name}.npz"
    if refdriver.available():
        want = _render_ref(scenario, num_frames)
        GOLDEN.mkdir(exist_ok=True)
        np.savez_compressed(path, out=want)
    elif path.exists():
        want = np.load(path)["out"]
    else:
        pytest.skip("no reference library and no cached golden output")
    got = _render_ours(scenario, num_frames)
    err = np.max(np.abs(got - want))
    assert err <= tol, f"max deviation {err:.3e} > {tol:g}"


def test_hrtf_single_source():
    scenario = [{"data": _tone(24000, 440.0),
                 "props": {"position": (1.0, 0.3, -2.0)}}]
    _golden_compare("hrtf_single", scenario, 4096, 1.0e-5)


def test_hrtf_behind_above():
    scenario = [{"data": _tone(24000, 300.0),
                 "props": {"position": (-0.5, 1.5, 2.0)}},
                {"data": _tone(20000, 650.0, 0.3),
                 "props": {"position": (2.0, -0.5, 0.5), "pitch": 1.21}}]
    _golden_compare("hrtf_two_sources", scenario, 4096, 1.0e-5)


def test_hrtf_resampled_voice():
    scenario = [{"data": _tone(24000, 500.0), "buf_rate": 44100,
                 "props": {"position": (0.0, 0.0, -1.0)}}]
    _golden_compare("hrtf_resampled", scenario, 4096, 1.0e-5)
