"""Vocal morpher (alc/effects/vmorpher.cpp): two 4-formant filter banks
(vowel A / vowel B) blended by an LFO.

Each formant is a topology-preserving-transform state variable filter
(vmorpher.cpp:109-138, band-pass output accumulated with a per-formant
gain).  The SVF recurrence

    H = (x - coeff*s1 - s2) * h        B = g*H + s1    L = g*B + s2
    s1' = 2*g*H + s1                   s2' = 2*g*B + s2

is linear in (x, s1, s2), so every formant maps onto the chunk-parallel
2-state kernel (ops/filters.linear2_chunked) with state-space matrices
derived host-side in float64 from the reference's f32 (g, gain) values.
All wet-bus channels share one batched call: L = channels * 8 filters.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.filters import linear2_chunked
from .base import EffectState, ambi_mix_params, effect_mix, register

f32 = np.float32

_RCP_Q = 1.0 / 5.0
WAVEFORM_FRAC_BITS = 24
WAVEFORM_FRAC_ONE = 1 << WAVEFORM_FRAC_BITS
WAVEFORM_FRAC_MASK = WAVEFORM_FRAC_ONE - 1

_WAVE_HALF, _WAVE_SIN, _WAVE_TRI, _WAVE_SAW = 0, 1, 2, 3

# Soprano formant table (vmorpher.cpp:181-230): (freqs Hz, gains) per phoneme
# index A/E/I/O/U; other phonemes have no filter data (zero output).
_PHONEMES = {
    0: ((800.0, 1150.0, 2900.0, 3900.0), (1.0, 0.501187, 0.025118, 0.1)),
    1: ((350.0, 2000.0, 2800.0, 3600.0), (1.0, 0.1, 0.177827, 0.009999)),
    2: ((270.0, 2140.0, 2950.0, 3900.0), (1.0, 0.251188, 0.050118, 0.050118)),
    3: ((450.0, 800.0, 2830.0, 3800.0), (1.0, 0.281838, 0.079432, 0.079432)),
    4: ((325.0, 700.0, 2700.0, 3800.0), (1.0, 0.158489, 0.017782, 0.009999)),
}


def _formant_ss(f0norm: np.ndarray, gain: np.ndarray):
    """State-space (A [F,2,2], B [F,2], C [F,2], D [F]) for SVF band-pass
    outputs, f64 derivation from the reference's f32 coefficient values."""
    g = np.tan(np.pi * f0norm.astype(f32)).astype(f32).astype(np.float64)
    gain = gain.astype(f32).astype(np.float64)
    h = 1.0 / (1.0 + g * _RCP_Q + g * g)
    gh = g * h
    A = np.stack([
        np.stack([1.0 - 2.0 * gh * (_RCP_Q + g), -2.0 * gh], -1),
        np.stack([2.0 * g * (1.0 - gh * (_RCP_Q + g)), 1.0 - 2.0 * g * gh], -1),
    ], -2)
    B = np.stack([2.0 * gh, 2.0 * g * gh], -1)
    # y = B_bp * gain = (g*H + s1) * gain
    C = np.stack([(1.0 - gh * (_RCP_Q + g)) * gain, -gh * gain], -1)
    D = gh * gain
    return (A.astype(f32), B.astype(f32), C.astype(f32), D.astype(f32))


def _phoneme_ss(phoneme: int, frequency: float, pitch: float):
    freqs, gains = _PHONEMES.get(int(phoneme), ((0.0,) * 4, (0.0,) * 4))
    f0 = np.array([f32(f) * f32(pitch) / f32(frequency) for f in freqs])
    return _formant_ss(f0, np.asarray(gains))


@register("vocal_morpher")
class VmorpherEffect(EffectState):
    defaults = {"phoneme_a": 0, "phoneme_b": 10,
                "phoneme_a_coarse": 0, "phoneme_b_coarse": 0,
                "waveform": 0, "rate": 1.41}

    def device_update(self, buffer=None) -> dict:
        B = self.device.wet_channels
        return {"index": jnp.zeros((), jnp.int32),
                "s": jnp.zeros((B * 8, 2), jnp.float32),
                "gain_cur": jnp.zeros((B, self.device.n_dry), jnp.float32)}

    def update(self, slot, props) -> dict:
        freq = float(self.device.sample_rate)
        step = f32(props["rate"]) / f32(freq)
        stepi = int(np.clip(np.rint(f32(step) * WAVEFORM_FRAC_ONE),
                            0, WAVEFORM_FRAC_ONE - 1))
        if stepi == 0:
            wave = _WAVE_HALF
        elif props["waveform"] == 0:
            wave = _WAVE_SIN
        elif props["waveform"] == 1:
            wave = _WAVE_TRI
        else:
            wave = _WAVE_SAW
        pitch_a = f32(2.0) ** (f32(props["phoneme_a_coarse"]) / f32(12.0))
        pitch_b = f32(2.0) ** (f32(props["phoneme_b_coarse"]) / f32(12.0))
        ssa = _phoneme_ss(props["phoneme_a"], freq, pitch_a)
        ssb = _phoneme_ss(props["phoneme_b"], freq, pitch_b)
        A = np.concatenate([ssa[0], ssb[0]])          # [8, 2, 2]
        Bm = np.concatenate([ssa[1], ssb[1]])
        C = np.concatenate([ssa[2], ssb[2]])
        D = np.concatenate([ssa[3], ssb[3]])
        _, gains = ambi_mix_params(self.device, slot.gain)
        return {"A": A, "B": Bm, "C": C, "D": D,
                "step": np.int32(stepi), "wave": np.int32(wave),
                "gain_tgt": gains}

    def process(self, state, params, wet, T: int):
        B = wet.shape[0]
        # int32 wraparound is exact mod 2^24 (2^32 is a multiple of 2^24).
        step = params["step"]
        idx = (state["index"]
               + (jnp.arange(T, dtype=jnp.int32) + 1) * step) & WAVEFORM_FRAC_MASK
        fi = idx.astype(jnp.float32)
        wave = params["wave"]
        lfo = jnp.where(
            wave == _WAVE_SIN,
            jnp.sin(fi * jnp.float32(2.0 * np.pi / WAVEFORM_FRAC_ONE))
            * 0.5 + 0.5,
            jnp.where(wave == _WAVE_TRI,
                      jnp.abs(fi * jnp.float32(2.0 / WAVEFORM_FRAC_ONE) - 1.0),
                      jnp.where(wave == _WAVE_SAW,
                                fi * jnp.float32(1.0 / WAVEFORM_FRAC_ONE),
                                jnp.full_like(fi, 0.5))))

        # [B*8, T]: every channel through all 8 formant filters at once.
        x8 = jnp.repeat(wet, 8, axis=0)
        A8 = jnp.tile(params["A"], (B, 1, 1))
        B8 = jnp.tile(params["B"], (B, 1))
        C8 = jnp.tile(params["C"], (B, 1))
        D8 = jnp.tile(params["D"], (B,))
        y, s2 = linear2_chunked(x8, state["s"], A8, B8, C8, D8)
        y = y.reshape(B, 2, 4, T).sum(axis=2)         # [B, vowel, T]
        blended = y[:, 0] + (y[:, 1] - y[:, 0]) * lfo[None, :]
        out, new_cur = effect_mix(blended, state["gain_cur"],
                                  jnp.asarray(params["gain_tgt"]), T)
        new_index = (state["index"] + step * jnp.int32(T)) & WAVEFORM_FRAC_MASK
        return out, None, {"index": new_index, "s": s2, "gain_cur": new_cur}
