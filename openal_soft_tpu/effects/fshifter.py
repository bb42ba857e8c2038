"""Frequency shifter (alc/effects/fshifter.cpp): Hilbert transform of the
wet signal in A-Format, then single-sideband modulation per channel.

The reference runs a 1024-point discrete Hilbert transform with 4x
overlap-add (HilSize=1024, HilStep=256, Hann window) in double precision;
here the same algorithm runs in float32 with one batched complex FFT over
the four A-Format lines per 256-sample step (the analytic-signal error of
f32 vs the reference's f64 is ~1e-6, inside the effect comparison budget).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .base import EffectState, ambi_mix_params, effect_mix, register

f32 = np.float32

HIL_SIZE = 1024
OVERSAMPLE = 4
HIL_STEP = HIL_SIZE // OVERSAMPLE        # 256
MIXER_FRAC_ONE = 1 << 16
MIXER_FRAC_MASK = MIXER_FRAC_ONE - 1

_SQRT3 = float(np.sqrt(3.0))
_DEC = f32(0.25 / _SQRT3)
B2A = np.array([
    [0.25,  _DEC,  _DEC,  _DEC],
    [0.25,  _DEC, -_DEC, -_DEC],
    [0.25, -_DEC, -_DEC,  _DEC],
    [0.25, -_DEC,  _DEC, -_DEC]], f32)        # rows: A0..A3; cols W,Y,Z,X
_ENC = f32(0.5 * _SQRT3)
A2B = np.array([
    [1.0,   1.0,   1.0,   1.0],
    [_ENC,  _ENC, -_ENC, -_ENC],
    [_ENC, -_ENC, -_ENC,  _ENC],
    [_ENC, -_ENC,  _ENC, -_ENC]], f32)        # rows W,Y,Z,X; cols A0..A3


def hann_window(n: int) -> np.ndarray:
    """gHannWindow<N> (common/hann_window.hpp): sin^2((i+1)*pi/(N+1)) for
    the first half, mirrored into the second half; f64 gen, f32 store."""
    half = (np.sin((np.arange(n // 2) + 1.0) * np.pi / (n + 1)) ** 2
            ).astype(f32)
    return np.concatenate([half, half[::-1]])


_WINDOW = hann_window(HIL_SIZE)


def complex_hilbert(x: jax.Array):
    """Analytic signal of real rows [L, N] (common/alcomplex.cpp:198-214).

    The reference runs inverse_fft → scale positives → forward_fft, which
    for real input equals conj(ifft(s·rfft(x))): real part = x (roundtrip),
    imaginary part = -H(x).  Returned as two real arrays (re, im): the TPU
    backend supports r2c/c2r FFTs but not c2c, and complex arrays cannot
    cross the host/device boundary at all.
    """
    N = x.shape[-1]
    X = jnp.fft.rfft(x, axis=-1)
    re = jnp.fft.irfft(X, n=N, axis=-1)
    mask = np.zeros(N // 2 + 1, f32)
    mask[1:N // 2] = 1.0
    im = jnp.fft.irfft(X * (1j * jnp.asarray(mask)), n=N, axis=-1)
    return re, im


@register("frequency_shifter")
class FshifterEffect(EffectState):
    defaults = {"frequency": 0.0, "left_direction": 0, "right_direction": 0}
    granularity = HIL_STEP

    def device_update(self, buffer=None) -> dict:
        return {
            "in_fifo": jnp.zeros((4, HIL_SIZE), jnp.float32),
            "out_fifo": jnp.zeros((2, 4, HIL_STEP), jnp.float32),
            "accum": jnp.zeros((2, 4, HIL_SIZE), jnp.float32),
            "pos": jnp.asarray(HIL_SIZE - HIL_STEP, jnp.int32),
            "phase": jnp.zeros(4, jnp.int32),
            "gain_cur": jnp.zeros((4, self.device.n_dry), jnp.float32),
        }

    def update(self, slot, props) -> dict:
        rate = float(self.device.sample_rate)
        step = f32(props["frequency"]) / f32(rate)
        stepi = int(np.rint(min(float(step), 1.0) * MIXER_FRAC_ONE))
        steps = np.full(4, stepi, np.int32)
        signs = np.ones(4, f32)
        reset = np.zeros(4, bool)
        for half, d in ((slice(0, 2), props["left_direction"]),
                        (slice(2, 4), props["right_direction"])):
            if d == 0:      # AL_FREQUENCY_SHIFTER_DIRECTION_DOWN
                signs[half] = -1.0
            elif d == 2:    # OFF: zero the phase and freeze it
                steps[half] = 0
                reset[half] = True
        _, gains = ambi_mix_params(self.device, slot.gain)
        return {"step": steps, "sign": signs,
                "phase_reset": reset, "gain_tgt": gains[:4]}

    def process(self, state, params, wet, T: int):
        n_in = min(wet.shape[0], 4)
        a_in = jnp.einsum("cd,dt->ct", jnp.asarray(B2A[:, :n_in]),
                          wet[:n_in], precision=jax.lax.Precision.HIGHEST)

        win = jnp.asarray(_WINDOW)
        n_frames = T // HIL_STEP

        def frame(carry, xk):
            fifo, out_fifo, accum, pos = carry
            # Copy out the previous frame's result, then stage new input.
            out_k = out_fifo
            fifo = jax.vmap(lambda row, v: jax.lax.dynamic_update_slice(
                row, v, (pos,)))(fifo, xk)
            pos = (pos + HIL_STEP) & (HIL_SIZE - 1)
            # Window the rotated FIFO and take the analytic signal.
            rot = jax.vmap(lambda row: jnp.roll(row, -pos))(fifo)
            re, im = complex_hilbert(rot * win[None, :])
            w2 = (win * f32(2.0 / OVERSAMPLE))[None, :]
            analytic = jnp.stack([re * w2, im * w2])         # [2, 4, N]
            # Overlap-add into the rotated accumulator.
            roll2 = jax.vmap(jax.vmap(jnp.roll, in_axes=(0, None)),
                             in_axes=(0, None))
            acc_rot = roll2(accum, -pos) + analytic
            out_fifo = acc_rot[:, :, :HIL_STEP]
            acc_rot = acc_rot.at[:, :, :HIL_STEP].set(0.0)
            accum = roll2(acc_rot, pos)
            return (fifo, out_fifo, accum, pos), out_k

        xs = jnp.swapaxes(a_in.reshape(4, n_frames, HIL_STEP), 0, 1)
        (fifo, out_fifo, accum, pos), outs = jax.lax.scan(
            frame, (state["in_fifo"], state["out_fifo"], state["accum"],
                    state["pos"]), xs)
        # outs: [n_frames, 2, 4, HIL_STEP] -> [2, 4, T]
        outdata = jnp.moveaxis(outs, 0, 2).reshape(2, 4, T)

        # Single-sideband modulation (fshifter.cpp:305-331).
        phase0 = jnp.where(jnp.asarray(params["phase_reset"]),
                           0, state["phase"])
        step = params["step"]
        idx = (phase0[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
               * step[:, None]) & MIXER_FRAC_MASK
        ph = idx.astype(jnp.float32) * f32(2.0 * np.pi / MIXER_FRAC_ONE)
        shifted = (outdata[0] * jnp.cos(ph)
                   + outdata[1] * jnp.sin(ph)
                   * jnp.asarray(params["sign"])[:, None])
        new_phase = (phase0 + step * jnp.int32(T)) & MIXER_FRAC_MASK

        bout = jnp.einsum("bc,ct->bt", jnp.asarray(A2B), shifted,
                          precision=jax.lax.Precision.HIGHEST)
        out, new_cur = effect_mix(bout, state["gain_cur"],
                                  jnp.asarray(params["gain_tgt"]), T)
        return out, None, {
            "in_fifo": fifo, "out_fifo": out_fifo, "accum": accum,
            "pos": pos, "phase": new_phase, "gain_cur": new_cur,
        }
