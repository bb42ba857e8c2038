"""End-to-end: mono source → stereo pairwise loopback render vs reference.

Golden vectors are generated from the reference library when available
(tests/refdriver.py) and cached under tests/golden/ as .npz so the suite
runs without the reference build.
"""

import os
import pathlib

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

from . import refdriver

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _tone(n, freq, rate, gain=0.5):
    t = np.arange(n) / rate
    return (gain * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _render_ours(scenario: dict, num_frames: int) -> np.ndarray:
    dev = LoopbackDevice(frequency=scenario["rate"], channels="stereo",
                         sample_type="float32", capacity=64)
    ctx = dev.create_context()
    srcs = []
    for s in scenario["sources"]:
        buf = ctx.create_buffer()
        buf.set_data(s["data"], "mono", "float32", s["buf_rate"])
        src = ctx.create_source()
        src.buffer(buf)
        src.looping = s.get("looping", False)
        for k, v in s.get("props", {}).items():
            src.set(k, v)
        srcs.append(src)
    for src in srcs:
        src.play()
    return dev.render_samples(num_frames)


def _render_ref(scenario: dict, num_frames: int) -> np.ndarray:
    ref = refdriver.RefLoopback(scenario["rate"], "stereo", "float32", hrtf=False)
    try:
        for s in scenario["sources"]:
            buf = ref.gen_buffer()
            ref.buffer_data(buf, refdriver.AL_FORMAT_MONO_FLOAT32,
                            s["data"], s["buf_rate"])
            src = ref.gen_source()
            ref.source_i(src, refdriver.AL_BUFFER, buf)
            if s.get("looping"):
                ref.source_i(src, refdriver.AL_LOOPING, 1)
            props = s.get("props", {})
            if "position" in props:
                ref.source_3f(src, refdriver.AL_POSITION, *props["position"])
            if "gain" in props:
                ref.source_f(src, refdriver.AL_GAIN, props["gain"])
            if "pitch" in props:
                ref.source_f(src, refdriver.AL_PITCH, props["pitch"])
            if "direct_gain_hf" in props:
                ref.lowpass_direct(src, props.get("direct_gain", 1.0),
                                   props["direct_gain_hf"])
            ref.play(src)
        return ref.render(num_frames)
    finally:
        ref.close()


def _golden_compare(name: str, scenario: dict, num_frames: int, tol: float):
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
    return err


def test_center_tone():
    """Centered mono tone at device rate (copy resample path)."""
    rate = 44100
    scenario = {"rate": rate, "sources": [
        {"data": _tone(rate // 2, 441.0, rate), "buf_rate": rate, "looping": True}]}
    _golden_compare("stereo_center_tone", scenario, 4096, 1.0e-5)


def test_panned_tone():
    """Off-center source exercises pairwise panning + attenuation."""
    rate = 44100
    scenario = {"rate": rate, "sources": [
        {"data": _tone(rate // 2, 300.0, rate), "buf_rate": rate, "looping": True,
         "props": {"position": (2.0, 0.5, -1.5)}}]}
    _golden_compare("stereo_panned_tone", scenario, 4096, 1.0e-5)


def test_resampled_tone():
    """Buffer rate != device rate exercises the spline resampler."""
    rate = 48000
    scenario = {"rate": rate, "sources": [
        {"data": _tone(22050, 500.0, 44100), "buf_rate": 44100, "looping": True,
         "props": {"position": (-1.0, 0.0, -1.0)}}]}
    _golden_compare("stereo_resampled_tone", scenario, 4096, 1.0e-5)


def test_pitch_shift_multi():
    """Several voices at different pitches, mixed."""
    rate = 44100
    rng = np.random.default_rng(7)
    noise = (rng.standard_normal(30000) * 0.2).astype(np.float32)
    scenario = {"rate": rate, "sources": [
        {"data": _tone(20000, 220.0, rate), "buf_rate": rate, "looping": True,
         "props": {"pitch": 1.5, "position": (1.0, 0.0, -2.0)}},
        {"data": noise, "buf_rate": rate, "looping": True,
         "props": {"pitch": 0.77, "gain": 0.8, "position": (-3.0, 0.0, -1.0)}},
    ]}
    _golden_compare("stereo_pitch_multi", scenario, 4096, 1.0e-5)


def test_filtered_tone():
    """Direct-path HF filter active (AL_DIRECT_FILTER lowpass analog).

    The chunked state-space biquad reassociates f32 ops; near-DC shelf
    filters accumulate up to ~5e-5 deviation vs the reference's
    sample-sequential TDF2, so this scenario runs at a 1e-4 budget."""
    rate = 44100
    scenario = {"rate": rate, "sources": [
        {"data": _tone(rate // 2, 700.0, rate), "buf_rate": rate, "looping": True,
         "props": {"position": (0.5, 0.0, -1.0), "direct_gain_hf": 0.3}}]}
    _golden_compare("stereo_filtered_tone", scenario, 4096, 1.0e-4)
