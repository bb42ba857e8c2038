import sys
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from openal_soft_tpu.alc.device import LoopbackDevice
from openal_soft_tpu.effects.reverb import ReverbEffect


class P:  # minimal slot props carrier
    pass


def main():
    dev = LoopbackDevice(frequency=48000, channels="stereo",
                         sample_type="float32", capacity=16, hrtf=True)
    ctx = dev.create_context()
    slot = ctx.create_aux_slot()
    eff = ctx.create_effect("eaxreverb")
    eff.set("decay_time", 3.1)
    eff.set("modulation_depth", 0.3)
    eff.set("modulation_time", 0.11)
    slot.set_effect(eff)
    dev._pallas_reverb = True
    rstate = slot.state
    assert isinstance(rstate, ReverbEffect), type(rstate)
    print("chunk", rstate.chunk, "passes", rstate.early_ap_passes,
          rstate.late_ap_passes, "mod_win", rstate.mod_win,
          "upmix", rstate.upmix)

    st = rstate.device_update()
    st = jax.tree.map(jnp.asarray, st)
    params = rstate.update(slot, eff.props)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    B = dev.wet_channels
    import sys as _s
    T = int(_s.argv[1]) if len(_s.argv) > 1 else 1024
    NB = int(_s.argv[2]) if len(_s.argv) > 2 else 6
    wets = [jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.3)
            for _ in range(NB)]

    # jnp reference path
    rstate_dev_flag = dev._pallas_ok
    dev._pallas_ok = False
    stj = st
    outs_j = []
    for w in wets:
        c, _, stj = rstate.process(stj, params, w, T)
        outs_j.append(np.asarray(c))
    dev._pallas_ok = rstate_dev_flag

    assert rstate._pallas_eligible(T), "pallas path not eligible?"
    stp = st
    outs_p = []
    for w in wets:
        c, _, stp = rstate.process(stp, params, w, T)
        outs_p.append(np.asarray(c))

    for i, (a, b) in enumerate(zip(outs_j, outs_p)):
        d = np.abs(a - b)
        ref = np.abs(a).max() + 1e-9
        print(f"block {i}: maxdiff {d.max():.3e}  rel {d.max()/ref:.3e}  "
              f"ref_peak {np.abs(a).max():.4f}")
    # state agreement
    for k in ("main", "A"):
        pass
    da = jax.tree.map(lambda x, y: float(jnp.abs(x - y).max()),
                      jax.tree.map(lambda x: x.astype(jnp.float32) if x.dtype != jnp.float32 else x, stj),
                      jax.tree.map(lambda x: x.astype(jnp.float32) if x.dtype != jnp.float32 else x, stp))
    worst = max(jax.tree.leaves(da))
    print("state worst abs diff:", worst)
    final = float(np.abs(np.concatenate(outs_j) - np.concatenate(outs_p)).max())
    assert final < 1e-4, final
    print("OK")


if __name__ == "__main__":
    main()
