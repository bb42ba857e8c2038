"""Stage-by-stage diff: Pallas reverb kernel vs the jnp pipeline.

Usage: python tools/t_reverb_dbg.py [stage ...]
Stages: taps lp hp eapd eap refl dread sc mod t60 lin vapd rev
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from openal_soft_tpu.alc.device import LoopbackDevice
from openal_soft_tpu.effects import reverb as rmod
from openal_soft_tpu.effects.reverb import ReverbEffect, B2A, NUM_LINES
from openal_soft_tpu.ops.pallas import reverb as rev_pallas


def main():
    stages = sys.argv[1:] or ["sc", "mod"]
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

    st = jax.tree.map(jnp.asarray, rstate.device_update())
    params = jax.tree.map(jnp.asarray, rstate.update(slot, eff.props))

    rng = np.random.default_rng(0)
    B = dev.wet_channels
    T = 1024
    wet = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.3)
    b2a = jnp.asarray(B2A)
    ain = jnp.einsum("cd,dt->ct", b2a, wet[:NUM_LINES],
                     precision=jax.lax.Precision.HIGHEST)

    # jnp reference with debug staging.
    offset0 = st["offset"]
    main_full = rmod._ring_write(st["main"], offset0, ain, T)
    pst = dict(st["A"])
    rstate._run_pipeline(pst, params, main_full, offset0, T, prefix="",
                         debug=True)
    ref = {k: np.asarray(v) for k, v in rstate._dbg_stages.items()}

    # kernel per stage.
    g = lambda k: jnp.asarray(params[k])
    serial = jnp.asarray(params["serial"])
    do_fade0 = pst["serial_done"] != serial

    def bc4(x):
        return jnp.broadcast_to(jnp.asarray(x, jnp.float32).reshape(-1),
                                (NUM_LINES,))

    params_i = jnp.concatenate([
        g("early_taps0").astype(jnp.int32),
        g("early_taps1").astype(jnp.int32),
        g("late_taps0").astype(jnp.int32),
        g("late_taps1").astype(jnp.int32),
        g("e_ap_off").astype(jnp.int32),
        g("e_off").astype(jnp.int32),
        g("l_ap_off").astype(jnp.int32),
        g("l_off").astype(jnp.int32),
        g("mod_step").astype(jnp.int32).reshape(1),
    ])
    params_f = jnp.concatenate([
        bc4(g("early_coeff0")), bc4(g("early_coeff1")),
        bc4(g("e_coeff")), bc4(g("t60_mid")), bc4(g("density_gain")),
        jnp.stack([g("e_ap_coeff"), g("l_ap_coeff"), g("mix_x"),
                   g("mix_y"), g("mod_depth")]).astype(jnp.float32),
        jnp.zeros(7, jnp.float32),
    ])
    cf = jnp.zeros((16, 128), jnp.float32)
    cf = cf.at[0:4, 0:5].set(jnp.broadcast_to(g("lp"), (NUM_LINES, 5)))
    cf = cf.at[4:8, 0:5].set(jnp.broadcast_to(g("hp"), (NUM_LINES, 5)))
    cf = cf.at[8:12, 0:5].set(jnp.broadcast_to(g("t60_hf"), (NUM_LINES, 5)))
    cf = cf.at[12:16, 0:5].set(jnp.broadcast_to(g("t60_lf"), (NUM_LINES, 5)))

    st_in = dict(pst)
    st_in["main"] = st["main"]

    for stage in stages:
        early, late, _ = rev_pallas.run_pipeline_pallas(
            ain, dict(st_in), params_i, params_f, cf,
            jnp.asarray(rmod._CUBIC_TAB8), offset0, pst["mod_index"],
            do_fade0, T, mod_win=rstate.mod_win,
            e_passes=rstate.early_ap_passes,
            l_passes=rstate.late_ap_passes, dbg=stage)
        # dbg output lands in `early`, already [NL, W] after host reshape.
        got = np.asarray(early).reshape(NUM_LINES, -1)
        n_chunks = T // rev_pallas.CH
        want = (ref[stage].transpose(1, 0, 2).reshape(NUM_LINES, -1)
                if ref[stage].ndim == 3 else ref[stage])
        d = np.abs(got - want)
        # report per-chunk maxdiff
        dc = d.reshape(NUM_LINES, n_chunks, rev_pallas.CH).max(axis=(0, 2))
        print(f"{stage:>6}: maxdiff {d.max():.3e}  per-chunk "
              + " ".join(f"{x:.1e}" for x in dc))


if __name__ == "__main__":
    main()
