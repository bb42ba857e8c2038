"""Voice-axis sharding of the render graph over a jax Mesh.

The reference is strictly single-process (SURVEY.md §2.2): its only
parallelism is SIMD lanes and one RT mixer thread.  Here the voice
population is SoA, so scaling across chips is one-axis data parallelism
over the *flagship* render graph (core/device.py:_render_one): each device
renders its shard of voices through resample→UHJ-decode→filter→mix→HRTF;
the three cross-voice reductions — the dry ambisonic bus, the wet effect
buses, and the HRTF accumulation spectra — combine with ``psum`` over ICI
(the only collectives), and the cheap post-voice stages (effect engines,
B-Format decode, the one inverse FFT) run replicated.  All per-voice
device state (filter z's, HRTF/UHJ histories) shards with its rows, so no
state ever moves between chips.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

VOICE_AXIS = "voices"


def _voice_spec(tree: dict, capacity: int) -> dict:
    """P(VOICE_AXIS) for leading-dim==capacity arrays, replicate the rest."""
    def spec(x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == capacity:
            return P(VOICE_AXIS)
        return P()
    return jax.tree.map(spec, tree)


def make_sharded_device_step(dev, mesh: Mesh, T: int):
    """Shard the full RenderDevice block graph over the mesh's voice axis.

    Returns f(state, ev, cfg, pool) -> (out [C, T], new_state, new_ev) with
    rows and per-voice state sharded; drop-in comparable with the
    single-device ``dev._render_one``.  Feeding (new_state, new_ev) back in
    renders consecutive blocks with carried state (filter z's, HRTF/UHJ
    histories, effect rings) — the multi-block path the driver dryrun and
    tests/test_sharding.py exercise.  Uses the jnp resampler path
    (rs_plan=None): the Pallas kernel targets the TPU backend and the
    validation mesh may be virtual-CPU.
    """
    L = dev.capacity

    def step(state, ev, cfg, pool):
        # Pallas kernels (resampler, reverb pipeline) target the TPU
        # backend; the validation mesh may be virtual-CPU, so flip the
        # device's kernel gate off for this trace (trace-time only — the
        # flag is restored before the traced graph ever runs).
        saved = dev._pallas_ok
        dev._pallas_ok = False
        try:
            out, new_state, new_ev = dev._render_one(
                state, ev, cfg, pool, T, dev._taps, None,
                axis_name=VOICE_AXIS)
        finally:
            dev._pallas_ok = saved
        return out, new_state, new_ev

    def build(state, ev, cfg, pool):
        state_specs = _voice_spec(state, L)
        ev_specs = _voice_spec(ev, L)
        cfg_specs = _voice_spec(cfg, L)
        # UHJ gather one-hots are [rows, L]: shard the voice-line axis.
        for k in cfg_specs:
            if isinstance(k, str) and k.startswith("uhj_g_"):
                cfg_specs[k] = P(None, VOICE_AXIS)
        sharded = shard_map(
            step, mesh=mesh,
            in_specs=(state_specs, ev_specs, cfg_specs, P()),
            out_specs=(P(), state_specs, ev_specs),
            check_rep=False)
        return jax.jit(sharded)

    return build


def device_step_inputs(dev, T: int):
    """Assemble (state, ev, cfg, pool) for a sharded step from a live device."""
    for ctx in dev.contexts:
        ctx.process_updates()
    if dev._cfg_dev is None:
        dev._refresh_uhj_groups()
        cfg = dev._cfg_from_table()
        dev._uhj_cfg(cfg)
        cfg["reset_rows"] = jnp.asarray(dev._pending_resets_mask())
        for i, slot in enumerate(dev.slots):
            cfg[f"slot{i}"] = {k: jnp.asarray(v)
                               for k, v in slot.compute_update().items()}
        dev._cfg_dev = cfg
    ev = dev.table.evolving_dict()
    return dev._state, ev, dev._cfg_dev, dev.pool.device_array()
