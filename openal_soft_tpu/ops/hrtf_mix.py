"""Batched HRTF mixing in the frequency domain.

The reference convolves each voice's (delayed, gain-ramped) samples with a
128-tap HRIR pair into a shared stereo accumulation buffer, one voice at a
time (core/mixer/hrtfbase.h MixHrtf/MixHrtfBlend), and folds the B-Format
dry bus through per-channel baked HRIRs the same way (MixDirectHrtf).  Here
the entire population goes through one FFT-domain pass.

The per-voice mix is  y[n] = sum_k c[k] * g(n-k) * x[n-k-d]  (gain ramps at
the output index, input delayed by the integer HRIR delay d).  Substituting
w[m] = g(m+d) * x[m]  and  c'[k] = c[k-d]  gives  y = c' * w, so:

  * the delay becomes an exact frequency-domain phase shift of the IR,
  * the gain envelope is evaluated analytically at shifted indices
    (pure elementwise arithmetic — no gathers, which are compile-time
    pathological on this backend),
  * the contraction over voices happens per frequency bin (MXU),
  * ONE inverse FFT recovers the stereo block plus its 128-sample carry
    tail — semantically identical to the reference's HrtfAccumData fold
    (hrtfbase.h:121-132), because the input-consumption window
    m in [-d, T-d) matches MixHrtfBase's reads exactly.
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


def fft_size(T: int) -> int:
    n = 1
    while n < HIST + T + HRIR_EXT:
        n <<= 1
    return n


def coeff_spectra(coeffs: jax.Array, nfft: int) -> jax.Array:
    """Delay-shifted HRIR spectra: [L, 192, 2] -> [L, 2, F] complex64.

    The integer HRIR delay is baked into the time-domain coefficients by
    the host (a shift, exact), so no per-bin phase factor is needed.
    Computed once per dispatch (outside the block scan) since coefficients
    are config."""
    return jnp.fft.rfft(coeffs.transpose(0, 2, 1), n=nfft, axis=2)


def hrtf_voices_accum_f(x_cat, C_new, delay, gain, C_old, old_delay,
                        old_gain, fade, active, T: int, fade_len: int,
                        nfft: int):
    """Frequency-domain stereo accumulation spectrum for a voice batch.

    Implements DoHrtfMix (core/voice.cpp:584-658): when fading, the old IR
    ramps out over fade_len samples while the new IR ramps in from zero;
    otherwise the new IR applies at constant gain (old_gain must equal gain,
    which the host guarantees by syncing Old ← Target each block).

    Cost structure: the IR spectra (C_new/C_old, see coeff_spectra) are
    computed once per dispatch by the caller; the per-block cost is the
    per-voice input FFTs.  Steady blocks (no voice fading — the common case)
    run through a ``lax.cond`` branch with 2 input FFTs per voice; fade
    blocks pay 4 (old + new set, per ear).

    Args:
      x_cat: [L, HIST+T] f32 history ++ filtered block samples.
      C_new/C_old: [L, 2, F] delay-shifted HRIR spectra.
      delay/old_delay: [L, 2] int32 (the envelope window still needs them).
      gain/old_gain: [L] f32; fade: [L] int32 (0 or fade_len); active: [L].
    Returns accum_f [nfft//2+1, 2] complex64.
    """
    j = jnp.arange(HIST + T, dtype=jnp.float32)
    fading = (fade > 0)[:, None, None]

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
        return jnp.where(valid, env, 0.0)

    def one_set(C, env):
        w = x_cat[:, None, :] * env                          # [L, 2, HIST+T]
        W = jnp.fft.rfft(w, n=nfft, axis=2)
        prod = jnp.where(active[:, None, None], W * C, 0.0)
        return jnp.sum(prod, axis=0).T                       # [F, 2]

    def fade_branch(_):
        total = one_set(C_new, shifted_env(delay, "new"))
        return total + one_set(C_old, shifted_env(old_delay, "old"))

    def steady_branch(_):
        # No fades: env is the constant gain inside the per-ear valid
        # window.  The old set contributes nothing (host syncs old <- new).
        return one_set(C_new, shifted_env(delay, "new"))

    any_fade = jnp.any(fade > 0)
    return jax.lax.cond(any_fade, fade_branch, steady_branch, None)


def direct_hrtf_accum_f(chans, C_dir, T: int, nfft: int):
    """Direct B-Format→binaural spectrum (the FIR part of MixDirectHrtf).

    chans: [D, T] hf-scaled dry channels; C_dir: [D, 2, F] baked-decode
    HRIR spectra (precomputed per dispatch via coeff_spectra).
    Returns accum_f [F, 2] complex64 in the voice accumulation frame.
    """
    w = jnp.pad(chans, ((0, 0), (HIST, 0)))
    W = jnp.fft.rfft(w, n=nfft, axis=1)                      # [D, F]
    return jnp.sum(W[:, None, :] * C_dir, axis=0).T          # [F, 2]


def fold_accum(accum_f, tail, T: int, nfft: int):
    """One inverse FFT + the accumulation-buffer fold (hrtfbase.h:121-132).

    tail: [128, 2] carry from the previous block.  Requires T >= 128.
    Returns (out [2, T], new_tail [128, 2]).
    """
    y = jnp.fft.irfft(accum_f.T, n=nfft, axis=1)
    y = y[:, HIST:HIST + T + HRIR_LENGTH]
    out = y[:, :T] + jnp.pad(tail.T, ((0, 0), (0, T - HRIR_LENGTH)))
    new_tail = y[:, T:T + HRIR_LENGTH].T
    return out, new_tail
