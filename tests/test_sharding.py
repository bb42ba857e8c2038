"""Multi-chip voice-axis sharding of the flagship render graph.

Runs the full device block graph (resample -> UHJ decode -> filters -> mix
-> HRTF accumulation -> effects) under shard_map on a virtual CPU mesh and
asserts equality with the single-device graph.  The psum reduction order
differs from the single-device tree sum by f32 reassociation only.
"""

import numpy as np
import pytest

import jax


def _cpu_devices():
    try:
        return jax.devices("cpu")
    except Exception:
        return []


@pytest.mark.skipif(len(_cpu_devices()) < 2,
                    reason="needs a multi-device host platform "
                           "(--xla_force_host_platform_device_count)")
def test_sharded_flagship_step():
    from jax.sharding import Mesh

    from openal_soft_tpu.alc.device import LoopbackDevice
    from openal_soft_tpu.parallel import sharding as sh

    n_dev = min(len(_cpu_devices()), 4)
    devices = np.array(_cpu_devices()[:n_dev])
    mesh = Mesh(devices, ("voices",))

    dev = LoopbackDevice(frequency=48000, channels="stereo",
                         sample_type="float32", capacity=2 * n_dev, hrtf=True)
    ctx = dev.create_context()
    slot = ctx.create_aux_slot()
    eff = ctx.create_effect("echo")
    slot.set_effect(eff)
    rng = np.random.default_rng(1)
    t = np.arange(9600) / 48000.0
    buf = ctx.create_buffer()
    buf.set_data((0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
                 "mono", "float32", 48000)
    for i in range(2 * n_dev - 1):
        src = ctx.create_source()
        src.buffer(buf)
        src.looping = True
        src.set("position", tuple(rng.standard_normal(3) * 2.0))
        src.set("pitch", float(2.0 ** rng.uniform(-0.5, 0.5)))
        src.send(slot, 0)
        src.play()

    T = 256
    state, ev, cfg, pool = sh.device_step_inputs(dev, T)
    step = sh.make_sharded_device_step(dev, mesh, T)(state, ev, cfg, pool)
    out, new_state = step(state, ev, cfg, pool)

    mesh1 = Mesh(devices[:1], ("voices",))
    step1 = sh.make_sharded_device_step(dev, mesh1, T)(state, ev, cfg, pool)
    ref, ref_state = step1(state, ev, cfg, pool)

    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() <= 2e-6
    # Per-voice carried state must match too (it shards with its rows).
    a = np.asarray(new_state["filter_z"])
    b = np.asarray(ref_state["filter_z"])
    assert np.abs(a - b).max() <= 1e-6
