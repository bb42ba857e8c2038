"""Ring modulator (alc/effects/modulator.cpp): sin/saw/square carrier
multiplied onto high-passed input channels."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops import spec
from ..ops.filters import _biquad_chunked_single
from .base import EffectState, ambi_mix_params, effect_mix, register

f32 = np.float32

_WAVE_ONE, _WAVE_SIN, _WAVE_SAW, _WAVE_SQUARE = 0, 1, 2, 3


@register("ring_modulator")
class ModulatorEffect(EffectState):
    defaults = {"frequency": 440.0, "highpass_cutoff": 800.0, "waveform": 0}

    def device_update(self, buffer=None) -> dict:
        B = self.device.wet_channels
        return {"index": jnp.zeros((), jnp.int32),
                "z": jnp.zeros((B, 2), jnp.float32),
                "gain_cur": jnp.zeros((B, self.device.n_dry), jnp.float32)}

    def update(self, slot, props) -> dict:
        freq = f32(self.device.sample_rate)
        spc = (freq / f32(props["frequency"]) + f32(0.5)
               if props["frequency"] > 0 else 1.0)
        rng = int(np.clip(spc, 1.0, freq))
        if rng == 1:
            wave, scale = _WAVE_ONE, f32(0.0)
        elif props["waveform"] == 0:    # sinusoid
            wave, scale = _WAVE_SIN, f32(2.0 * np.pi / rng)
        elif props["waveform"] == 1:    # sawtooth
            wave, scale = _WAVE_SAW, f32(2.0 / rng)
        else:                            # square
            wave, scale = _WAVE_SQUARE, f32(1.0 / rng)
        fcut = f32(props["highpass_cutoff"] / freq)
        w0 = f32(2.0 * np.pi) * min(fcut, f32(0.49))
        rcpq = f32(2.0 * np.sinh(np.log(2.0) / 2.0 * 0.75 * w0 / np.sin(w0)))
        coeffs = spec.biquad_set_params("highpass", fcut, f32(1.0), rcpq)
        _, gains = ambi_mix_params(self.device, slot.gain)
        return {"range": np.int32(rng), "scale": scale, "wave": np.int32(wave),
                "filter": coeffs, "gain_tgt": gains}

    def process(self, state, params, wet, T: int):
        B = wet.shape[0]
        idx = (state["index"] + jnp.arange(T, dtype=jnp.int32)) % params["range"]
        fi = idx.astype(jnp.float32)
        wave = params["wave"]
        mod = jnp.where(wave == _WAVE_SIN, jnp.sin(fi * params["scale"]),
              jnp.where(wave == _WAVE_SAW, fi * params["scale"] - 1.0,
              jnp.where(wave == _WAVE_SQUARE,
                        (fi * params["scale"] < 0.5).astype(jnp.float32) * 2.0 - 1.0,
                        jnp.ones_like(fi))))
        cf = jnp.tile(jnp.asarray(params["filter"])[None, None, :], (T // 32, B, 1))
        y, z2 = _biquad_chunked_single(wet, state["z"], cf, 32)
        y = y * mod[None, :]
        out, new_cur = effect_mix(y, state["gain_cur"],
                                  jnp.asarray(params["gain_tgt"]), T)
        new_index = (state["index"] + T) % params["range"]
        return out, None, {"index": new_index, "z": z2, "gain_cur": new_cur}
