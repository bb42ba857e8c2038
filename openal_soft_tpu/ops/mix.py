"""Gain-ramped batched mixing.

The reference's MixLine (core/mixer/mixer_c.cpp:150-186) accumulates one
voice channel into one output line with a linear gain ramp over the first
``Counter`` samples (64-sample fades, core/voice.cpp:1008) and a -100 dB
silence skip.  Sequential over voices there; here the voice axis is batched
and the sum over voices becomes one MXU contraction:

  * samples [0, F): per-(voice, channel, t) ramp gains — small einsum.
  * samples [F, T): constant target gains — a single [C,V]x[V,T-F] matmul.

The per-sample gain values match MixLine bit-for-bit (same f32 `gain +
step*stepcount` form); only the cross-voice accumulation order differs
(fixed-order tree reduction instead of sequential voices), which is
deterministic run-to-run and within the 1e-5 comparison budget.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import GAIN_SILENCE_THRESHOLD

_F32_EPS = float(np.finfo(np.float32).eps)


def ramp_gains(cur: jax.Array, tgt: jax.Array, counter: jax.Array, fade: int):
    """Per-sample mix gains for the fade region plus steady-state tail gains.

    Args:
      cur: [V, C] f32 current gains.
      tgt: [V, C] f32 target gains.
      counter: [V] int32 fade counters (0 = no fade; otherwise <= fade).
      fade: static fade-region length F = min(64, T).
    Returns:
      (head [V, C, F] per-sample gains, tail [V, C] steady gains,
       new_cur [V, C] updated current gains).
    """
    counter_f = counter.astype(jnp.float32)
    delta = jnp.where(counter > 0, 1.0 / jnp.maximum(counter_f, 1.0), 0.0)
    step = (tgt - cur) * delta[:, None]
    ramp_active = jnp.abs(step) > _F32_EPS

    tgt_masked = jnp.where(jnp.abs(tgt) > GAIN_SILENCE_THRESHOLD, tgt, 0.0)

    t = jnp.arange(fade, dtype=jnp.float32)
    in_fade = t[None, :] < counter_f[:, None]                       # [V, F]
    ramped = cur[:, :, None] + step[:, :, None] * t[None, None, :]  # [V, C, F]
    head = jnp.where(ramp_active[:, :, None] & in_fade[:, None, :],
                     ramped, tgt_masked[:, :, None])

    # counter <= F <= T always holds on the render path, so the fade
    # completes within the block and the new current gain is the target
    # (MixLine's `fade_len < Counter` early-out can't trigger).
    new_cur = tgt
    return head, tgt_masked, new_cur


def mix_voices(x: jax.Array, cur: jax.Array, tgt: jax.Array, counter: jax.Array,
               fade: int):
    """Accumulate voice-channel samples into output lines.

    Args:
      x: [V, T] f32 input samples (one mixing channel per row).
      cur/tgt: [V, C] f32 current/target gains.
      counter: [V] int32 fade counters.
      fade: static F = min(64, T).
    Returns: (out [C, T] f32, new_cur [V, C]).
    """
    head, tail, new_cur = ramp_gains(cur, tgt, counter, fade)
    # Full f32 contractions: the mix bus must hold the 1e-5 comparison budget,
    # so keep the MXU in highest-precision (f32) mode for these sums.
    out_head = jnp.einsum("vt,vct->ct", x[:, :fade], head,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    out_tail = jnp.einsum("vc,vt->ct", tail, x[:, fade:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([out_head, out_tail], axis=1), new_cur


def mix_voices_grouped(x: jax.Array, cur: jax.Array, tgt: jax.Array,
                       counter: jax.Array, group: jax.Array, n_groups: int,
                       fade: int):
    """Like mix_voices but voices route to one of ``n_groups`` output buses
    (effect-slot wet buses).  group: [V] int32 bus index per voice.

    Returns (out [n_groups, C, T], new_cur [V, C]).
    """
    head, tail, new_cur = ramp_gains(cur, tgt, counter, fade)
    onehot = jax.nn.one_hot(group, n_groups, dtype=x.dtype)        # [V, G]
    out_head = jnp.einsum("vg,vt,vct->gct", onehot, x[:, :fade], head,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    out_tail = jnp.einsum("vg,vc,vt->gct", onehot, tail, x[:, fade:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([out_head, out_tail], axis=2), new_cur
