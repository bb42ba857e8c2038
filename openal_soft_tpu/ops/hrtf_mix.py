"""Batched HRTF mixing as MXU contractions (FIR-as-matmul).

The reference convolves each voice's (delayed, gain-ramped) samples with a
128-tap HRIR pair into a shared stereo accumulation buffer, one voice at a
time (core/mixer/hrtfbase.h MixHrtf/MixHrtfBlend), and folds the B-Format
dry bus through per-channel baked HRIRs the same way (MixDirectHrtf).  Here
the entire population is accumulated with two matrix products.

The per-voice mix is  y[n] = sum_k c[k] * g(n-k) * x[n-k-d]  (gain ramps at
the output index, input delayed by the integer HRIR delay d).  Substituting
w[m] = g(m+d) * x[m]  and  c'[k] = c[k-d]  gives  y = c' * w, and summing
over voices v:

    y[e, n] = sum_v sum_k c'[v, k, e] * w[v, e, n-k]
            = sum_k P[e, k, n-k],   P[e, k, n] = sum_v c'[v, k, e] w[v, e, n]

so the whole population reduces to

  * an elementwise envelope (pure arithmetic, no gathers — the gain ramp
    evaluated analytically at shifted indices),
  * ONE [taps, V] x [V, N] contraction per ear on the MXU — this is where
    all the FLOPs are (the survey's "FIR-as-matmul" layout: 192 x 4096 x
    1088 x 2 ears ~ 3.4 GFLOP/block at the flagship scene),
  * a skew-sum over the tap axis (y[n] = sum_k P[k, n-k]), implemented as
    a pad + reshape that realigns each tap row by its lag — an
    anti-diagonal reduction with no gathers or shifts.

The input-consumption window m in [HIST-d, HIST-d+T) matches MixHrtfBase's
reads exactly, and the block fold (out = y[:T] + tail carry) is
semantically identical to the reference's HrtfAccumData fold
(hrtfbase.h:121-132).  vs the previous frequency-domain form (2 x
rfft(2048) per voice per block) this removes every FFT from the HRTF path
and turns a VPU/bandwidth-bound stage into an MXU one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (
    GAIN_SILENCE_THRESHOLD,
    HRIR_LENGTH,
    HRTF_HISTORY_LENGTH,
)

HIST = HRTF_HISTORY_LENGTH  # 64
HRIR_EXT = HRIR_LENGTH + HIST  # 192: HRIR shifted by its integer delay

_HI = jax.lax.Precision.HIGHEST


def skew_sum(P: jax.Array) -> jax.Array:
    """Anti-diagonal sum  y[e, n] = sum_d P[e, d, n - d]  without gathers.

    Pad each tap row by D zeros, flatten, and re-view with a row stride one
    shorter: row d of the new view is row d of the old shifted right by d
    (the overhang lands in the zero padding), so a plain sum over rows
    yields the convolution output.  P: [E, D, N] -> y: [E, N + D - 1].
    """
    E, D, N = P.shape
    W = N + D - 1
    flat = jnp.pad(P, ((0, 0), (0, 0), (0, D))).reshape(E, D * (N + D))
    return flat[:, :D * W].reshape(E, D, W).sum(axis=1)


def hrtf_voices_accum(x_cat, coeffs, delay, gain, old_coeffs, old_delay,
                      old_gain, fade, active, T: int, fade_len: int):
    """Time-domain stereo accumulation for a voice batch (MXU form).

    Implements DoHrtfMix (core/voice.cpp:584-658): when fading, the old IR
    ramps out over fade_len samples while the new IR ramps in from zero;
    otherwise the new IR applies at constant gain (old_gain must equal gain,
    which the host guarantees by syncing Old ← Target each block).

    Steady blocks (no voice fading — the common case) run through a
    ``lax.cond`` branch with one contraction per ear; fade blocks pay two
    (old + new IR set).

    Args:
      x_cat: [L, HIST+T] f32 history ++ filtered block samples.
      coeffs/old_coeffs: [L, 192, 2] f32 delay-shifted HRIRs (the integer
        delay is baked in as a time shift by the host — exact).
      delay/old_delay: [L, 2] int32 (the envelope window still needs them).
      gain/old_gain: [L] f32; fade: [L] int32 (0 or fade_len); active: [L].
    Returns y_ext [2, HIST+T+191] f32 in the accumulation frame.
    """
    N = HIST + T
    j = jnp.arange(N, dtype=jnp.float32)
    fading = (fade > 0)[:, None, None]
    act = active[:, None, None]

    def shifted_env(d, kind):
        # Envelope evaluated at arg = m + d, m the input stream index.
        arg = j[None, None, :] - HIST + d[:, :, None].astype(jnp.float32)
        if kind == "new":
            step = (gain / jnp.float32(fade_len))[:, None, None]
            ramp = jnp.where((gain > GAIN_SILENCE_THRESHOLD)[:, None, None],
                             step * arg, 0.0)
            env = jnp.where(fading & (arg < fade_len), ramp, gain[:, None, None])
        else:
            step = (old_gain / jnp.float32(fade_len))[:, None, None]
            env = jnp.where(fading & (arg < fade_len)
                            & (old_gain > GAIN_SILENCE_THRESHOLD)[:, None, None],
                            step * (jnp.float32(fade_len) - arg), 0.0)
        valid = (arg >= 0.0) & (arg < T)
        return jnp.where(valid & act, env, 0.0)

    def one_set(c, env):
        w = x_cat[:, None, :] * env                          # [L, 2, N]
        # [2, 192, L] x [2, L, N] -> P [2, 192, N]: the hot MXU contraction.
        return jnp.einsum("vde,ven->edn", c, w,
                          preferred_element_type=jnp.float32, precision=_HI)

    def fade_branch(_):
        return (one_set(coeffs, shifted_env(delay, "new"))
                + one_set(old_coeffs, shifted_env(old_delay, "old")))

    def steady_branch(_):
        # No fades: env is the constant gain inside the per-ear valid
        # window (arg = n - HIST + d in [0, T)), so the gain folds into the
        # IR matrix and the hot contraction takes a single [L, N] rhs —
        # halving its input traffic and skipping the [L, 2, N] env
        # materialization entirely.  The fold overcounts only the per-ear
        # window edges: the first HIST-d samples (history the reference
        # does not re-read) and the last d samples (beyond the block), each
        # confined to a HIST-wide strip, subtracted with two small matmuls
        # (PROFILE.md "single-rhs HRTF form").
        g = jnp.where(active, gain, 0.0)
        gc = coeffs * g[:, None, None]                       # [L, 192, 2]
        P = jnp.einsum("vde,vn->edn", gc, x_cat,
                       preferred_element_type=jnp.float32, precision=_HI)
        k = jnp.arange(HIST, dtype=jnp.int32)
        inv_head = k[None, None, :] < (HIST - delay)[:, :, None]
        w_head = jnp.where(inv_head, x_cat[:, None, :HIST], 0.0)
        P_head = jnp.einsum("vde,ven->edn", gc, w_head,
                            preferred_element_type=jnp.float32, precision=_HI)
        inv_tail = k[None, None, :] >= (HIST - delay)[:, :, None]
        w_tail = jnp.where(inv_tail, x_cat[:, None, T:], 0.0)
        P_tail = jnp.einsum("vde,ven->edn", gc, w_tail,
                            preferred_element_type=jnp.float32, precision=_HI)
        P = P.at[:, :, :HIST].add(-P_head)
        return P.at[:, :, T:].add(-P_tail)

    any_fade = jnp.any(fade > 0)
    P = jax.lax.cond(any_fade, fade_branch, steady_branch, None)
    return skew_sum(P)


def hrtf_voices_accum_split(hist, x, coeffs, delay, gain, old_coeffs,
                            old_delay, old_gain, fade, active, T: int,
                            fade_len: int):
    """hrtf_voices_accum without materializing x_cat = [hist ++ x].

    The steady branch contracts history and block samples separately and
    concatenates the (tiny) P halves instead of the [L, HIST+T] sample
    buffer — for the fused super-block path, where T is 8-16 blocks wide
    and the concat alone would move hundreds of MB of HBM.  The fade
    branch (at most one per config upload) concatenates and delegates.
    """
    def steady_branch(_):
        g = jnp.where(active, gain, 0.0)
        gc = coeffs * g[:, None, None]                       # [L, 192, 2]
        P_h = jnp.einsum("vde,vn->edn", gc, hist,
                         preferred_element_type=jnp.float32, precision=_HI)
        P_x = jnp.einsum("vde,vn->edn", gc, x,
                         preferred_element_type=jnp.float32, precision=_HI)
        P = jnp.concatenate([P_h, P_x], axis=2)              # [2, 192, N]
        k = jnp.arange(HIST, dtype=jnp.int32)
        inv_head = k[None, None, :] < (HIST - delay)[:, :, None]
        w_head = jnp.where(inv_head, hist[:, None, :], 0.0)
        P_head = jnp.einsum("vde,ven->edn", gc, w_head,
                            preferred_element_type=jnp.float32, precision=_HI)
        inv_tail = k[None, None, :] >= (HIST - delay)[:, :, None]
        w_tail = jnp.where(inv_tail, x[:, None, T - HIST:], 0.0)
        P_tail = jnp.einsum("vde,ven->edn", gc, w_tail,
                            preferred_element_type=jnp.float32, precision=_HI)
        P = P.at[:, :, :HIST].add(-P_head)
        return P.at[:, :, T:].add(-P_tail)

    def fade_branch(_):
        x_cat = jnp.concatenate([hist, x], axis=1)
        N = HIST + T
        j = jnp.arange(N, dtype=jnp.float32)
        fading = (fade > 0)[:, None, None]
        act = active[:, None, None]

        def shifted_env(d, kind):
            arg = (j[None, None, :] - HIST
                   + d[:, :, None].astype(jnp.float32))
            if kind == "new":
                step = (gain / jnp.float32(fade_len))[:, None, None]
                ramp = jnp.where(
                    (gain > GAIN_SILENCE_THRESHOLD)[:, None, None],
                    step * arg, 0.0)
                env = jnp.where(fading & (arg < fade_len), ramp,
                                gain[:, None, None])
            else:
                step = (old_gain / jnp.float32(fade_len))[:, None, None]
                env = jnp.where(
                    fading & (arg < fade_len)
                    & (old_gain > GAIN_SILENCE_THRESHOLD)[:, None, None],
                    step * (jnp.float32(fade_len) - arg), 0.0)
            valid = (arg >= 0.0) & (arg < T)
            return jnp.where(valid & act, env, 0.0)

        def one_set(c, env):
            w = x_cat[:, None, :] * env
            return jnp.einsum("vde,ven->edn", c, w,
                              preferred_element_type=jnp.float32,
                              precision=_HI)

        return (one_set(coeffs, shifted_env(delay, "new"))
                + one_set(old_coeffs, shifted_env(old_delay, "old")))

    P = jax.lax.cond(jnp.any(fade > 0), fade_branch, steady_branch, None)
    return skew_sum(P)


def direct_hrtf_accum(chans, c_dir, T: int) -> jax.Array:
    """Direct B-Format→binaural (the FIR part of MixDirectHrtf), MXU form.

    chans: [D, T] hf-scaled dry channels; c_dir: [D, 192, 2] baked-decode
    HRIRs zero-extended to the voice tap frame.
    Returns y_ext [2, HIST+T+191] f32 in the voice accumulation frame.
    """
    w = jnp.pad(chans, ((0, 0), (HIST, 0)))                  # [D, N]
    P = jnp.einsum("vde,vn->edn", c_dir, w,
                   preferred_element_type=jnp.float32, precision=_HI)
    return skew_sum(P)


def fold_accum(y_ext, tail, T: int):
    """The accumulation-buffer fold (hrtfbase.h:121-132).

    y_ext: [2, HIST+T+191] accumulation-frame output; tail: [128, 2] carry
    from the previous block.  Requires T >= 128.
    Returns (out [2, T], new_tail [128, 2]).
    """
    y = y_ext[:, HIST:HIST + T + HRIR_LENGTH]
    out = y[:, :T] + jnp.pad(tail.T, ((0, 0), (0, T - HRIR_LENGTH)))
    new_tail = y[:, T:T + HRIR_LENGTH].T
    return out, new_tail
