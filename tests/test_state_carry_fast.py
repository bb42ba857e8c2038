"""Slim state-carry guards for the fast-CI set.

Round-4 CI trimming dropped chunk-invariance and checkpoint/resume from
`pytest -m fast`, leaving the state-carry semantics (positions, gain
ramps, filter memories, reverb rings across dispatch boundaries) unguarded
in quick runs.  These are the same properties at minimal scale: capacity 8,
short windows, one compile-light scene each.  The full-scale suites
(test_chunk_invariance.py, test_checkpoint.py, test_device_fallback.py)
run in the unmarked full `pytest tests/` pass — executed at least once per
round before the end-of-round bench (see ARCHITECTURE.md, fast-suite
note).
"""

import numpy as np

from openal_soft_tpu.alc.device import LoopbackDevice

f32 = np.float32
RATE = 48000
TOTAL = 1024


def _scene(pitch: bool, reverb: bool):
    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                        sample_type="float32", capacity=8)
    ctx = dev.create_context()
    slot = None
    if reverb:
        slot = ctx.create_aux_slot()
        eff = ctx.create_effect("eaxreverb")
        slot.set_effect(eff)
    t = np.arange(RATE // 4) / RATE
    for i in range(2):
        buf = ctx.create_buffer()
        buf.set_data((0.3 * np.sin(2 * np.pi * (220 + 110 * i) * t)
                      ).astype(f32), "mono", "float32", RATE)
        src = ctx.create_source()
        src.buffer(buf)
        src.looping = True
        src.set("position", (0.5 - i, 0.1, -1.0))
        if pitch:
            src.set("pitch", 1.0 + 0.25 * (i + 1))
        if slot is not None:
            src.send(slot, 0)
        src.play()
    return dev


def test_chunk_invariance_slim():
    """128-sample dispatches == one whole dispatch (bit-level for the
    stereo graph at equal dispatch sizes is not guaranteed across XLA
    fusion choices; 1e-6 absolute)."""
    whole = _scene(pitch=True, reverb=False).render_samples(TOTAL)
    dev = _scene(pitch=True, reverb=False)
    parts = [dev.render_samples(128) for _ in range(TOTAL // 128)]
    np.testing.assert_allclose(np.concatenate(parts), whole, atol=1e-6)


def test_checkpoint_restore_slim():
    dev1 = _scene(pitch=False, reverb=True)
    dev1.render_samples(512)
    snap = dev1.snapshot()
    want = dev1.render_samples(512)

    dev2 = _scene(pitch=False, reverb=True)
    dev2.render_samples(512)
    dev2.restore(snap)
    got = dev2.render_samples(512)
    np.testing.assert_array_equal(got, want)
