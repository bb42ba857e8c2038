"""Block-split invariance: any render_samples partitioning is bit-identical.

Guards the whole host-mirror design (alc/context.py finish_chunk +
event-horizon chunking): positions, gain ramps, filter interpolation, and
loop wraps must evolve identically whether the device renders 1-, 8-, or
64-block dispatches or serves odd sizes from the carry buffer.
"""

import numpy as np
import pytest

from openal_soft_tpu.alc.device import LoopbackDevice

f32 = np.float32
RATE = 48000
TOTAL = 4096


def _build(hrtf=False):
    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=16, hrtf=hrtf)
    ctx = dev.create_context()
    rng = np.random.default_rng(9)
    t = np.arange(RATE // 2) / RATE
    for i in range(3):
        buf = ctx.create_buffer()
        tone = (0.3 * np.sin(2 * np.pi * (220 + 110 * i) * t)).astype(f32)
        buf.set_data(tone, "mono", "float32", RATE)
        src = ctx.create_source()
        src.buffer(buf)
        src.looping = True
        src.set("position", tuple(rng.standard_normal(3) * 2.0))
        src.set("pitch", float(2.0 ** rng.uniform(-0.5, 0.5)))
        src.play()
    return dev


@pytest.mark.parametrize("hrtf", [False, True])
def test_partitioning_is_invariant(hrtf):
    """Equal within float roundoff: different dispatch sizes compile
    different graphs, and XLA's per-graph fusion choices can shift single
    ULPs (stereo); the HRTF path additionally sizes its FFT per dispatch,
    reassociating the (exact-in-theory) convolution."""
    def check(a, b):
        np.testing.assert_allclose(a, b, atol=4e-6 if hrtf else 1e-7)

    whole = _build(hrtf).render_samples(TOTAL)

    dev = _build(hrtf)
    chunks = [dev.render_samples(128) for _ in range(TOTAL // 128)]
    check(np.concatenate(chunks), whole)

    dev = _build(hrtf)
    parts, served = [], 0
    for n in (100, 924, 1, 3000, 71):
        parts.append(dev.render_samples(n))
        served += n
    check(np.concatenate(parts), whole[:served])


def _build_loaded(pitch=True):
    """HRTF + mixed pitch + one EAXReverb slot with per-voice sends: the
    bench.py `loaded` composition at test scale — exercises the fused
    super-block path WITH effect slots (core/device.py _render_chunk)."""
    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=16, hrtf=True)
    ctx = dev.create_context()
    slot = ctx.create_aux_slot()
    eff = ctx.create_effect("eaxreverb")
    slot.set_effect(eff)
    rng = np.random.default_rng(13)
    t = np.arange(RATE // 2) / RATE
    for i in range(4):
        buf = ctx.create_buffer()
        tone = (0.3 * np.sin(2 * np.pi * (220 + 110 * i) * t)).astype(f32)
        buf.set_data(tone, "mono", "float32", RATE)
        src = ctx.create_source()
        src.buffer(buf)
        src.looping = True
        src.set("position", tuple(rng.standard_normal(3) * 2.0))
        if pitch:
            src.set("pitch", float(2.0 ** rng.uniform(-1, 1)))
        src.send(slot, 0)
        src.play()
    return dev


@pytest.mark.parametrize("pitch", [True, False])
def test_loaded_fused_invariance(pitch):
    """The fused super-block path with slots (wet mix at window width +
    per-block effect pipelines) must match per-block dispatches."""
    whole = _build_loaded(pitch).render_samples(TOTAL)
    dev = _build_loaded(pitch)
    blocks = [dev.render_samples(1024) for _ in range(TOTAL // 1024)]
    np.testing.assert_allclose(np.concatenate(blocks), whole, atol=4e-6)
    assert np.isfinite(whole).all()


def test_native_rate_hrtf_fused_invariance():
    """Native-rate HRTF scenes select the fused super-block contraction
    (core/device.py _render_chunk fused_hrtf): whole-window accumulation
    must match per-block dispatches within float roundoff."""
    def build():
        dev = LoopbackDevice(frequency=RATE, channels="stereo",
                             sample_type="float32", capacity=16, hrtf=True)
        ctx = dev.create_context()
        rng = np.random.default_rng(4)
        t = np.arange(RATE // 2) / RATE
        for i in range(3):
            buf = ctx.create_buffer()
            tone = (0.3 * np.sin(2 * np.pi * (220 + 110 * i) * t)).astype(f32)
            buf.set_data(tone, "mono", "float32", RATE)
            src = ctx.create_source()
            src.buffer(buf)
            src.looping = True
            src.set("position", tuple(rng.standard_normal(3) * 2.0))
            src.play()   # pitch 1.0: the unit/fused path
        return dev

    whole = build().render_samples(TOTAL)      # multi-block: fused window
    dev = build()
    blocks = [dev.render_samples(1024) for _ in range(TOTAL // 1024)]
    np.testing.assert_allclose(np.concatenate(blocks), whole, atol=4e-6)
