"""Pitch shifter (alc/effects/pshifter.cpp): Bernsee-style phase vocoder.

1024-point STFT, 8x overlap (128-sample steps), Hann window.  The W channel
runs the full analysis/synthesis (phase unwrap, bin shift, phase
accumulate); the other ambisonic channels are phase-locked to W
(pshifter.cpp:363-412).

The reference's order-dependent synthesis-bin accumulation — a later bin
replaces the target frequency only if its magnitude exceeds the *sum* of
magnitudes already accumulated on that synthesis bin (pshifter.cpp:308-314)
— vectorizes exactly: the bin map j(k) = (k*pitch + half) >> 16 is
non-decreasing in k, so source bins form contiguous segments and the
accumulated-so-far magnitude is a segment-local exclusive prefix sum.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .base import EffectState, ambi_mix_params, effect_mix, register
from .fshifter import hann_window

f32 = np.float32

STFT_SIZE = 1024
HALF = STFT_SIZE // 2            # 512
NBINS = HALF + 1                 # 513
OVERSAMPLE = 8
STEP = STFT_SIZE // OVERSAMPLE   # 128
FRAC_BITS = 16
FRAC_ONE = 1 << FRAC_BITS
FRAC_HALF = FRAC_ONE >> 1
NUM_LINES = 9                    # EffectMaxOrder=2 (pshifter.cpp:60-62)

_EXPECTED = f32(2.0 * np.pi / OVERSAMPLE)
_WINDOW = hann_window(STFT_SIZE)
_SCALE = f32(3.0 / OVERSAMPLE)   # pffft backward is unscaled: N * ifft


def _wrap_pi(x):
    """tmp -= qpd + qpd%2 with float2int truncation (pshifter.cpp:290-293)."""
    q = x.astype(jnp.int32)
    return x - (q + jax.lax.rem(q, 2)).astype(jnp.float32)


def _seg_accum(j, mag, payload, valid):
    """The reference's sequential synthesis-bin accumulation, vectorized.

    j: [..., K] int32 non-decreasing bin map; mag/payload: [..., K];
    valid: [..., K] bool.  Returns (syn_mag [..., NBINS],
    syn_payload [..., NBINS]) matching pshifter.cpp:308-314 exactly.
    """
    k = jnp.arange(j.shape[-1], dtype=jnp.int32)
    mag_v = jnp.where(valid, mag, 0.0)
    csum = jnp.cumsum(mag_v, axis=-1)
    excl = csum - mag_v
    start = jnp.concatenate([jnp.ones_like(j[..., :1], bool),
                             j[..., 1:] != j[..., :-1]], axis=-1)
    base = jax.lax.cummax(jnp.where(start, excl, -1.0), axis=j.ndim - 1)
    prefix = excl - base
    win = valid & (mag > prefix)
    big = j * jnp.int32(2048) + jnp.where(win, k, -1)
    lastwin = jax.lax.cummax(big, axis=j.ndim - 1) - j * jnp.int32(2048)
    final = jnp.concatenate([j[..., 1:] != j[..., :-1],
                             jnp.ones_like(j[..., :1], bool)], axis=-1)
    pay_w = jnp.take_along_axis(payload, jnp.clip(lastwin, 0, None), axis=-1)
    pay_w = jnp.where(final & (lastwin >= 0), pay_w, 0.0)
    jc = jnp.where(valid, j, NBINS)
    onehot = (jc[..., :, None] ==
              jnp.arange(NBINS, dtype=jnp.int32)).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    syn_mag = jnp.einsum("...kj,...k->...j", onehot, mag_v, precision=hi)
    oh_fin = (jnp.where(final, jc, NBINS)[..., :, None] ==
              jnp.arange(NBINS, dtype=jnp.int32)).astype(jnp.float32)
    syn_pay = jnp.einsum("...kj,...k->...j", oh_fin, pay_w, precision=hi)
    return syn_mag, syn_pay


@register("pitch_shifter")
class PshifterEffect(EffectState):
    defaults = {"coarse_tune": 12, "fine_tune": 0}

    def device_update(self, buffer=None) -> dict:
        n = min(self.device.wet_channels, NUM_LINES)
        return {
            "fifo": jnp.zeros((n, STFT_SIZE), jnp.float32),
            "accum": jnp.zeros((n, STFT_SIZE), jnp.float32),
            "pos": jnp.asarray(STFT_SIZE - STEP, jnp.int32),
            "last_phase": jnp.zeros(NBINS, jnp.float32),
            "sum_phase": jnp.zeros(NBINS, jnp.float32),
            "gain_cur": jnp.zeros((n, self.device.n_dry), jnp.float32),
        }

    def update(self, slot, props) -> dict:
        tune = int(props["coarse_tune"]) * 100 + int(props["fine_tune"])
        pitch = f32(2.0) ** (f32(tune) / f32(1200.0))
        pitch_i = np.int32(np.rint(np.clip(pitch, 0.5, 2.0) * FRAC_ONE))
        _, gains = ambi_mix_params(self.device, slot.gain)
        n = min(self.device.wet_channels, NUM_LINES)
        return {"pitch_i": pitch_i,
                "pitch": np.float32(pitch_i * (1.0 / FRAC_ONE)),
                "gain_tgt": gains[:n]}

    def process(self, state, params, wet, T: int):
        n = min(wet.shape[0], NUM_LINES)
        win = jnp.asarray(_WINDOW)
        k = jnp.arange(NBINS, dtype=jnp.int32)
        pitch_i, pitch = params["pitch_i"], params["pitch"]
        j = (k * pitch_i + FRAC_HALF) >> FRAC_BITS
        w_valid = j <= HALF
        bin_limit = jnp.int32((NBINS << FRAC_BITS) - FRAC_HALF - 1)
        bin_count = jnp.minimum(NBINS, bin_limit // pitch_i + 1)
        nw_valid = k < bin_count
        jc = jnp.minimum(j, HALF)

        def frame(carry, xk):
            fifo, accum, pos, last_phase, sum_phase = carry
            out_k = jax.vmap(lambda r: jax.lax.dynamic_slice(
                r, (pos,), (STEP,)))(fifo)
            fifo = jax.vmap(lambda r, v: jax.lax.dynamic_update_slice(
                r, v, (pos,)))(fifo, xk)
            pos = (pos + STEP) & (STFT_SIZE - 1)
            rot = jax.vmap(lambda r: jnp.roll(r, -pos))(fifo)
            X = jnp.fft.rfft(rot * win[None, :], axis=-1)   # [n, NBINS]

            # W channel: full phase vocoder (pshifter.cpp:264-361).
            mag_w = jnp.abs(X[0])
            ph_w = jnp.arctan2(jnp.imag(X[0]), jnp.real(X[0]))
            tmp = (ph_w - last_phase) - (k & (OVERSAMPLE - 1)
                                         ).astype(jnp.float32) * _EXPECTED
            last_phase = ph_w
            tmp = _wrap_pi(tmp * f32(1.0 / np.pi)) * f32(0.5 * OVERSAMPLE)
            freqbin = k.astype(jnp.float32) + tmp
            syn_mag, syn_fb = _seg_accum(j, mag_w, freqbin * pitch, w_valid)
            bin_off = (k & ~jnp.int32(OVERSAMPLE - 1)).astype(jnp.float32)
            tmp2 = (syn_fb - bin_off) * _EXPECTED
            sum_phase = _wrap_pi((tmp2 + sum_phase) * f32(1.0 / np.pi)) \
                * f32(np.pi)
            Xw = syn_mag * (jnp.cos(sum_phase) + 1j * jnp.sin(sum_phase))

            # Other channels: phase-locked to W (pshifter.cpp:363-412).
            if n > 1:
                Xo = X[1:]
                mag_o = jnp.abs(Xo)
                pd = jnp.arctan2(jnp.imag(Xo), jnp.real(Xo)) \
                    - last_phase[None, :]
                jb = jnp.broadcast_to(jc, (n - 1, NBINS))
                syn_mag_o, syn_pd = _seg_accum(
                    jb, mag_o, pd, jnp.broadcast_to(nw_valid, mag_o.shape))
                ph = _wrap_pi((sum_phase[None, :] + syn_pd)
                              * f32(1.0 / np.pi)) * f32(np.pi)
                Xno = syn_mag_o * (jnp.cos(ph) + 1j * jnp.sin(ph))
                Xs = jnp.concatenate([Xw[None, :], Xno], axis=0)
            else:
                Xs = Xw[None, :]

            y = jnp.fft.irfft(Xs, n=STFT_SIZE, axis=-1) * _SCALE \
                * win[None, :]
            acc_rot = jax.vmap(lambda r: jnp.roll(r, -pos))(accum) + y
            fifo = jax.vmap(lambda r, v: jax.lax.dynamic_update_slice(
                r, v, (pos,)))(fifo, acc_rot[:, :STEP])
            acc_rot = acc_rot.at[:, :STEP].set(0.0)
            accum = jax.vmap(lambda r: jnp.roll(r, pos))(acc_rot)
            return (fifo, accum, pos, last_phase, sum_phase), out_k

        xs = jnp.swapaxes(wet[:n].reshape(n, T // STEP, STEP), 0, 1)
        (fifo, accum, pos, last_phase, sum_phase), outs = jax.lax.scan(
            frame, (state["fifo"], state["accum"], state["pos"],
                    state["last_phase"], state["sum_phase"]), xs)
        bout = jnp.swapaxes(outs, 0, 1).reshape(n, T)
        out, new_cur = effect_mix(bout, state["gain_cur"],
                                  jnp.asarray(params["gain_tgt"]), T)
        return out, None, {
            "fifo": fifo, "accum": accum, "pos": pos,
            "last_phase": last_phase, "sum_phase": sum_phase,
            "gain_cur": new_cur,
        }
