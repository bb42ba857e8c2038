"""Voice-axis sharding of the render graph over a jax Mesh.

The reference is strictly single-process (SURVEY.md §2.2): its only
parallelism is SIMD lanes and one RT mixer thread.  Here the voice
population is SoA, so scaling across chips is a one-axis data parallelism:
each device renders its shard of voices through resample→filter→mix, the
per-shard dry (ambisonic) buses are combined with one ``psum`` over ICI, and
the cheap post-process decode runs replicated.  All per-voice device state
(filter z's, HRTF histories) shards with its rows, so no state ever moves
between chips.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..constants import GAIN_FADE_SAMPLES
from ..ops import filters as f_ops
from ..ops import mix as mix_ops
from ..ops import resample as rs_ops

VOICE_AXIS = "voices"


def make_sharded_render_step(mesh: Mesh, bank: dict, dec_hf, dec_lf, split_coeff,
                             taps: int, T: int):
    """Build a pjit-style sharded block renderer.

    Args:
      mesh: 1-D device mesh with axis name VOICE_AXIS.
      bank: resampler weight bank (replicated).
      dec_hf/dec_lf: decode matrices (replicated; dec_lf may be None).
      split_coeff: band-splitter coefficient for dual-band decode.
      taps/T: static resampler window and block length.
    Returns: f(state, params, pool) -> (out [C, T], new_state), where params
      rows and state rows are sharded along the voice axis.
    """
    # Keep decode matrices as host numpy: they trace into the graph as
    # constants, so they materialize on whatever backend the mesh lives on
    # (the virtual-CPU dryrun runs while the default backend is a TPU).
    dec_hf = np.asarray(dec_hf)
    dec_lf = np.asarray(dec_lf) if dec_lf is not None else None

    param_specs = {
        # per-row fields shard on the leading (voice-line) axis
        k: P(VOICE_AXIS)
        for k in ("active", "playing", "fade", "pos_int", "pos_frac", "increment",
                  "bank_row", "sf", "src_off", "src_len", "loop_start", "loop_end",
                  "has_loop", "has_wrapped", "dry_cur", "dry_tgt", "filter_active",
                  "filter_coeffs", "filter_target", "filter_counter")
    }
    state_specs = {"filter_z": P(VOICE_AXIS)}
    if dec_lf is not None:
        state_specs["split_state"] = P()  # replicated post-process state

    def step(state, p, pool):
        # Materialize constants inside the trace so they land on the mesh's
        # backend, not the process-default one.
        bank_c = {k: jnp.asarray(np.asarray(v)) for k, v in bank.items()}
        x = rs_ops.resample_voices(
            pool, p["src_off"], p["src_len"], p["loop_start"], p["loop_end"],
            p["has_loop"], p["has_wrapped"], p["pos_int"], p["pos_frac"],
            p["increment"], p["bank_row"], p["sf"], bank_c, T, taps)
        x = jnp.where(p["active"][:, None], x, 0.0)
        y, z2, _, _ = f_ops.biquad_dual_interp_chunked(
            x, state["filter_z"], p["filter_coeffs"], p["filter_target"],
            p["filter_counter"])
        x_mix = jnp.where(p["filter_active"][:, None], y, x)
        new_state = dict(state)
        new_state["filter_z"] = jnp.where(p["filter_active"][:, None, None], z2, 0.0)

        dry_tgt = jnp.where(p["playing"][:, None], p["dry_tgt"], 0.0)
        dry_local, _ = mix_ops.mix_voices(x_mix, p["dry_cur"], dry_tgt, p["fade"],
                                          min(GAIN_FADE_SAMPLES, T))
        # Combine shard dry buses over ICI: the only cross-chip collective.
        dry = jax.lax.psum(dry_local, VOICE_AXIS)

        if dec_lf is not None:
            hp, lp, sp_state = f_ops.band_split(dry, state["split_state"], split_coeff)
            new_state["split_state"] = sp_state
            out = (jnp.einsum("cd,dt->ct", dec_hf, hp,
                              precision=jax.lax.Precision.HIGHEST)
                   + jnp.einsum("cd,dt->ct", dec_lf, lp,
                                precision=jax.lax.Precision.HIGHEST))
        else:
            out = jnp.einsum("cd,dt->ct", dec_hf, dry,
                             precision=jax.lax.Precision.HIGHEST)
        return out, new_state

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(state_specs, param_specs, P()),
        out_specs=(P(), state_specs),
        check_rep=False,
    )
    return jax.jit(sharded)
