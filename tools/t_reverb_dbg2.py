"""Cross-window state-carry diff: pallas reverb vs jnp, window by window.

Each window w feeds BOTH paths the same jnp-carried state, so the first
diverging window/stage is isolated (not cumulative)."""
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
    rstate = slot.state
    assert isinstance(rstate, ReverbEffect)

    st0 = jax.tree.map(jnp.asarray, rstate.device_update())
    params = jax.tree.map(jnp.asarray, rstate.update(slot, eff.props))

    rng = np.random.default_rng(0)
    B = dev.wet_channels
    T = 1024
    wets = [jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.3)
            for _ in range(4)]

    dev._pallas_reverb = True
    stj = st0
    for w, wet in enumerate(wets):
        # jnp authoritative step
        dev._pallas_ok = False
        cj, _, stj_next = rstate.process(stj, params, wet, T)
        dev._pallas_ok = True
        # pallas step from the SAME input state
        assert rstate._pallas_eligible(T)
        cp, _, stp_next = rstate.process(stj, params, wet, T)
        dc = float(jnp.abs(cj - cp).max())
        msg = [f"w{w}: contrib maxdiff {dc:.3e}"]
        for k in stj_next["A"]:
            a = stj_next["A"][k].astype(jnp.float32)
            b = stp_next["A"][k].astype(jnp.float32)
            d = float(jnp.abs(a - b).max())
            if d > 1e-5:
                msg.append(f"A.{k}:{d:.2e}")
        de = np.abs(np.asarray(stj_next["A"]["early_dl"])
                    - np.asarray(stp_next["A"]["early_dl"]))
        if de.max() > 1e-5:
            L = de.shape[1]
            li, pos = np.unravel_index(de.argmax(), de.shape)
            off_now = int(stj["offset"])
            print(f"   edl diff: line {li} pos {pos} (off {off_now} "
                  f"L {L} rel {(pos - off_now) % L}) "
                  f"nbad {(de > 1e-5).sum()} "
                  f"badpos {np.unique((np.nonzero(de > 1e-5)[1]) // 128)[:20]}")
        dm = float(jnp.abs(stj_next["main"] - stp_next["main"]).max())
        if dm > 1e-5:
            msg.append(f"main:{dm:.2e}")
        do = float(jnp.abs(stj_next["offset"] - stp_next["offset"]).max())
        if do:
            msg.append(f"offset:{do}")
        print("  ".join(msg), flush=True)
        stj = stj_next


if __name__ == "__main__":
    main()
