"""Time ReverbEffect.process: jnp pipeline vs Pallas kernel (one per run).

    python tools/bench_reverb.py [pallas|jnp] [T]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from openal_soft_tpu.alc.device import LoopbackDevice
from openal_soft_tpu.effects.reverb import ReverbEffect


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    dev = LoopbackDevice(frequency=48000, channels="stereo",
                         sample_type="float32", capacity=16, hrtf=True)
    dev._pallas_reverb = mode == "pallas"
    ctx = dev.create_context()
    slot = ctx.create_aux_slot()
    eff = ctx.create_effect("eaxreverb")
    eff.set("decay_time", 3.1)
    eff.set("modulation_depth", 0.3)
    slot.set_effect(eff)
    rstate = slot.state
    st = jax.tree.map(jnp.asarray, rstate.device_update())
    params = jax.tree.map(jnp.asarray, rstate.update(slot, eff.props))

    step = jax.jit(lambda st, w: rstate.process(st, params, w, T))

    rng = np.random.default_rng(0)
    B = dev.wet_channels
    wet = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.3)
    c, _, st2 = step(st, wet)
    c.block_until_ready()
    st = st2
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        c, _, st = step(st, wet)
    c.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"{mode}: {dt*1e3:.3f} ms per {T}-frame window "
          f"({dt/(T//1024 or 1)*1e3:.3f} ms/1024-block)")


if __name__ == "__main__":
    main()
