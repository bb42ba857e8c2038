"""Chorus / Flanger (alc/effects/chorus.cpp).

B-Format input converts to a 4-line A-Format; each line runs through a
modulated cubic-interpolated delay tap (sin or triangle LFO, the right pair
phase-displaced) with feedback at the average delay, then converts back.

TPU realization: the LFO delay sequences are pure index arithmetic
([T] vectors from the carried LFO offset); the modulated taps read a
contiguous ring window and gather lane-locally; the feedback recurrence
``buf[o] = in[o] + fb * buf[o - avgdelay]`` is solved in closed form by
log-depth geometric doubling (S_{2m} = S_m + fb^m * shift(S_m, m*d)) after
injecting the ring history at the block boundary — exact modulo f32
reassociation of the geometric sum.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import MIXER_FRAC_BITS
from .base import DelayRing, EffectState, ambi_mix_params, effect_mix, register
from .reverb import _cubic_filter_table

f32 = np.float32

_DEC = f32(0.25 / np.sqrt(3.0))
_ENC = f32(0.5 * np.sqrt(3.0))
B2A = np.array([[0.25, _DEC, _DEC, _DEC],
                [0.25, _DEC, -_DEC, -_DEC],
                [0.25, -_DEC, -_DEC, _DEC],
                [0.25, -_DEC, _DEC, -_DEC]], f32)
A2B = np.array([[1.0, 1.0, 1.0, 1.0],
                [_ENC, _ENC, -_ENC, -_ENC],
                [_ENC, -_ENC, -_ENC, _ENC],
                [_ENC, -_ENC, _ENC, -_ENC]], f32)

CHORUS_MAX_DELAY = 0.016
FLANGER_MAX_DELAY = 0.004
MAX_RESAMPLER_EDGE = 24
_TABLE_BITS = 8
_TABLE_STEPS = 256
_CUBIC = _cubic_filter_table()


@register("chorus")
class ChorusEffect(EffectState):
    defaults = {"waveform": 1, "rate": 1.1, "depth": 0.1, "feedback": 0.25,
                "delay": 0.016, "phase": 90}
    max_delay = max(CHORUS_MAX_DELAY, FLANGER_MAX_DELAY)

    def __init__(self, device) -> None:
        super().__init__(device)
        self._lfo_offset = 0
        self._lfo_range = 1
        self._born_clock = 0

    def state_signature(self):
        return (self.name,)

    def device_update(self, buffer=None) -> dict:
        freq = self.device.sample_rate
        # NextPowerOf2(MaxDelay*2*freq + 1) per line (deviceUpdate).
        n = 1
        while n < int(self.max_delay * 2.0 * freq) + 1:
            n <<= 1
        self._buflen = max(n, 2048)
        self._lfo_offset = 0
        self._lfo_range = 1
        self._born_clock = getattr(self.device, "_clock_samples", 0)
        return {
            "buf": jnp.zeros((4, self._buflen), jnp.float32),
            "offset": jnp.zeros((), jnp.int32),
            "lfo_ns": jnp.zeros((), jnp.int32),   # samples since creation
            "gain_cur": jnp.zeros((4, self.device.n_dry), jnp.float32),
        }

    def update(self, slot, props) -> dict:
        freq = f32(self.device.sample_rate)
        mindelay = MAX_RESAMPLER_EDGE << _TABLE_BITS
        stepscale = f32(freq * _TABLE_STEPS)
        delay = max(int(np.rint(f32(props["delay"]) * stepscale)), mindelay)
        depth = f32(min(f32(delay) * f32(props["depth"]),
                        f32(delay - mindelay)))

        rate = f32(props["rate"])
        # Host mirror of the device's rendered-sample counter, used to keep
        # LFO phase continuous across rate changes (the reference rescales
        # mLfoOffset in place; here the params hold the phase origin).
        ns = (getattr(self.device, "_clock_samples", 0)
              - self._born_clock) % (1 << 30)
        if not rate > 0.0:
            self._lfo_offset, self._lfo_range = 0, 1
            lfo_scale, lfo_disp = f32(0.0), 0
        else:
            lfo_range = int(min(np.rint(freq / rate), 2 ** 31 / 360 - 180))
            phase_now = (self._lfo_offset + ns) % self._lfo_range
            self._lfo_offset = (phase_now * lfo_range // self._lfo_range
                                - ns) % lfo_range
            self._lfo_range = lfo_range
            if int(props["waveform"]) == 1:   # AL_CHORUS_WAVEFORM_TRIANGLE
                lfo_scale = f32(4.0 / lfo_range)
            else:                             # 0 = sinusoid
                lfo_scale = f32(2.0 * np.pi / lfo_range)
            phase = int(props["phase"])
            if phase < 0:
                phase += 360
            lfo_disp = (lfo_range * phase + 180) // 360

        _, gains = ambi_mix_params(self.device, slot.gain)
        return {
            "delay": np.int32(delay), "depth": depth,
            "feedback": f32(props["feedback"]),
            "waveform": np.int32(int(props["waveform"])),
            "lfo_scale": lfo_scale, "lfo_disp": np.int32(lfo_disp),
            "lfo_range": np.int32(self._lfo_range),
            "lfo_offset": np.int32(self._lfo_offset),
            "gain_tgt": gains[:4],
            "block_serial": np.int32(0),  # placeholder (offset evolves on device)
        }

    def _mod_delays(self, params, lfo_pos, T: int):
        """[2, T] modulated delays (calcTriangle/SinusoidDelays)."""
        i = jnp.arange(T, dtype=jnp.int32)
        rng = params["lfo_range"]
        offs0 = (lfo_pos + i) % rng
        offs1 = (lfo_pos + params["lfo_disp"] + i) % rng
        offs = jnp.stack([offs0, offs1]).astype(jnp.float32)
        norm = offs * params["lfo_scale"]
        tri = (1.0 - jnp.abs(2.0 - norm)) * params["depth"]
        sin = jnp.sin(norm) * params["depth"]
        lfo = jnp.where(params["waveform"] == 1, tri, sin)
        return jnp.round(lfo).astype(jnp.int32) + params["delay"]

    def process(self, state, params, wet, T: int):
        hi = jax.lax.Precision.HIGHEST
        a_in = jnp.einsum("cd,dt->ct", jnp.asarray(B2A), wet[:4], precision=hi)

        # LFO position: phase origin from params + carried sample counter.
        lfo_pos = (jnp.asarray(params["lfo_offset"])
                   + state["lfo_ns"]) % params["lfo_range"]
        moddelays = self._mod_delays(params, lfo_pos, T)      # [2, T]

        # Feedback solve: buf[o] = in[o] + fb*buf[o-ad], via history
        # injection + geometric doubling.
        # avgdelay = (delay + MixerFracHalf) >> MixerFracBits, reproducing
        # the reference's scale mix (chorus.cpp:326); can be 0 for short
        # flanger delays, where the feedback becomes a same-sample gain.
        ad = ((params["delay"] + (1 << (MIXER_FRAC_BITS - 1)))
              >> MIXER_FRAC_BITS).astype(jnp.int32)
        ad_safe = jnp.maximum(ad, 1)
        ring = {"buf": state["buf"], "offset": state["offset"]}
        hist = DelayRing.read(ring, ad_safe, T)               # buf[o-ad], o<ad
        idx = jnp.arange(T, dtype=jnp.int32)[None, :]
        u = a_in + jnp.where(idx < ad_safe,
                             params["feedback"] * hist, 0.0)
        m = 1
        fbm = params["feedback"]
        while m < 1024:
            u = u + fbm * _shift0(u, ad_safe * m, T)
            fbm = fbm * fbm
            m <<= 1
        resolved = jnp.where(ad == 0,
                             a_in * (1.0 + params["feedback"]), u)

        ring = DelayRing.write(ring, resolved, T)

        # Modulated cubic taps: window covering [-maxlag-2, T) relative to
        # this block's write start (the ring offset has already advanced by
        # T, hence the +T lookback).
        maxlag = self._buflen // 2
        win = DelayRing.read_window(ring, maxlag + 2 + T, 0)   # [4, maxlag+2+T]
        phase = moddelays & (_TABLE_STEPS - 1)
        ctab = jnp.asarray(_CUBIC)[phase]                      # [2, T, 4]
        out_lines = []
        for c in range(4):
            md = moddelays[0] if c < 2 else moddelays[1]
            cd = ctab[0] if c < 2 else ctab[1]
            base = (maxlag + 2 - (md >> _TABLE_BITS)) + jnp.arange(T)
            w = win[c]
            smp = (jnp.take(w, base + 1, mode="clip") * cd[:, 0]
                   + jnp.take(w, base, mode="clip") * cd[:, 1]
                   + jnp.take(w, base - 1, mode="clip") * cd[:, 2]
                   + jnp.take(w, base - 2, mode="clip") * cd[:, 3])
            out_lines.append(smp)
        a_out = jnp.stack(out_lines)

        b_out = jnp.einsum("cd,dt->ct", jnp.asarray(A2B), a_out, precision=hi)
        out, new_cur = effect_mix(b_out, state["gain_cur"],
                                  jnp.asarray(params["gain_tgt"]), T)
        new_state = {"buf": ring["buf"], "offset": ring["offset"],
                     "lfo_ns": (state["lfo_ns"] + T) % (1 << 30),
                     "gain_cur": new_cur}
        return out, None, new_state


def _shift0(x: jax.Array, lag, T: int) -> jax.Array:
    """[B, T] rows shifted right by a traced lag, zero fill."""
    ext = jnp.concatenate([jnp.zeros_like(x), x], axis=1)
    start = jnp.clip(T - lag, 0, T).astype(jnp.int32)
    return jax.vmap(lambda row: jax.lax.dynamic_slice(row, (start,), (T,)))(ext)


@register("flanger")
class FlangerEffect(ChorusEffect):
    defaults = {"waveform": 1, "rate": 0.27, "depth": 1.0, "feedback": -0.5,
                "delay": 0.002, "phase": 0}
