"""Checkpoint/resume: serialize mid-stream, restore, bit-identical
continuation (SURVEY §5 checkpoint row — the carried-state pytree is the
checkpoint)."""

import numpy as np

from openal_soft_tpu.alc.device import LoopbackDevice

RATE = 48000


def _scene(reverb=True):
    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=16)
    ctx = dev.create_context()
    slot = None
    if reverb:
        slot = ctx.create_aux_slot()
        eff = ctx.create_effect("eaxreverb")
        slot.set_effect(eff)
    t = np.arange(RATE // 2) / RATE
    buf = ctx.create_buffer()
    buf.set_data((0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
                 "mono", "float32", RATE)
    src = ctx.create_source()
    src.buffer(buf)
    src.looping = True
    src.set("position", (0.8, 0.2, -1.0))
    if slot is not None:
        src.send(slot, 0)
    src.play()
    return dev


def test_snapshot_restore_bit_exact_continuation():
    dev1 = _scene()
    dev1.render_samples(2048)
    snap = dev1.snapshot()
    want = dev1.render_samples(3072)

    # A second, identically-scened device reaches the same host state,
    # then restores the snapshot: the continuation must be bit-identical.
    dev2 = _scene()
    dev2.render_samples(2048)
    dev2.restore(snap)
    got = dev2.render_samples(3072)
    np.testing.assert_array_equal(got, want)


def test_snapshot_is_plain_numpy():
    dev = _scene(reverb=False)
    dev.render_samples(1024)
    snap = dev.snapshot()
    import jax

    for leaf in jax.tree.leaves(snap):
        assert isinstance(leaf, (np.ndarray, np.generic, int, type(None))), \
            type(leaf)
    # Round-trips through np.savez (a real serialization boundary).
    import io
    buf = io.BytesIO()
    np.savez(buf, **{f"s{i}": leaf for i, leaf in
                     enumerate(jax.tree.leaves(snap))
                     if leaf is not None})
    assert buf.tell() > 0
