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


def fft_size(T: int) -> int:
    n = 1
    while n < HIST + T + HRIR_LENGTH:
        n <<= 1
    return n


def hrtf_voices_accum_f(x_cat, coeffs, delay, gain, old_coeffs, old_delay,
                        old_gain, fade, active, T: int, fade_len: int,
                        nfft: int):
    """Frequency-domain stereo accumulation spectrum for a voice batch.

    Implements DoHrtfMix (core/voice.cpp:584-658): when fading, the old IR
    ramps out over fade_len samples while the new IR ramps in from zero;
    otherwise the new IR applies at constant gain (old_gain must equal gain,
    which the host guarantees by syncing Old ← Target each block).

    Args:
      x_cat: [L, HIST+T] f32 history ++ filtered block samples.
      coeffs/old_coeffs: [L, 128, 2] HRIRs; delay/old_delay: [L, 2] int32.
      gain/old_gain: [L] f32; fade: [L] int32 (0 or fade_len); active: [L].
    Returns accum_f [nfft//2+1, 2] complex64.
    """
    j = jnp.arange(HIST + T, dtype=jnp.float32)
    fading = (fade > 0)[:, None, None]
    freqs = jnp.arange(nfft // 2 + 1, dtype=jnp.float32)

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

    def one_set(c, d, env):
        w = x_cat[:, None, :] * env                          # [L, 2, HIST+T]
        W = jnp.fft.rfft(w, n=nfft, axis=2)
        C = jnp.fft.rfft(c.transpose(0, 2, 1), n=nfft, axis=2)
        phase = jnp.exp((-2j * jnp.pi / nfft) * freqs[None, None, :]
                        * d[:, :, None].astype(jnp.float32)).astype(jnp.complex64)
        prod = jnp.where(active[:, None, None], W * C * phase, 0.0)
        return jnp.sum(prod, axis=0).T                       # [F, 2]

    total = one_set(coeffs, delay, shifted_env(delay, "new"))
    total = total + one_set(old_coeffs, old_delay, shifted_env(old_delay, "old"))
    return total


def direct_hrtf_accum_f(chans, chan_coeffs, T: int, nfft: int):
    """Direct B-Format→binaural spectrum (the FIR part of MixDirectHrtf).

    chans: [D, T] hf-scaled dry channels; chan_coeffs: [D, 128, 2].
    Returns accum_f [F, 2] complex64 in the voice accumulation frame.
    """
    w = jnp.pad(chans, ((0, 0), (HIST, 0)))
    W = jnp.fft.rfft(w, n=nfft, axis=1)                      # [D, F]
    C = jnp.fft.rfft(chan_coeffs.transpose(0, 2, 1), n=nfft, axis=2)
    return jnp.sum(W[:, None, :] * C, axis=0).T              # [F, 2]


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
