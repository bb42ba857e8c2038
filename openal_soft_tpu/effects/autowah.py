"""Autowah effect (alc/effects/autowah.cpp): an envelope follower sweeps a
peaking bandpass across [20, 2500] Hz per sample; every wet channel runs
through the swept filter with its own state.

The envelope and the per-sample-coefficient biquad are true sample
recurrences; they run as lax.scan (unrolled x8) — per-slot cost, not
per-voice."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .base import EffectState, ambi_mix_params, effect_mix, register

f32 = np.float32

GAIN_SCALE = 31621.0
MIN_FREQ = 20.0
MAX_FREQ = 2500.0
Q_FACTOR = 5.0


@register("autowah")
class AutowahEffect(EffectState):
    defaults = {"attack_time": 0.06, "release_time": 0.06,
                "resonance": 1000.0, "peak_gain": 11.22}

    def device_update(self, buffer=None) -> dict:
        B = self.device.wet_channels
        return {"env": jnp.zeros((), jnp.float32),
                "z": jnp.zeros((B, 2), jnp.float32),
                "gain_cur": jnp.zeros((B, self.device.n_dry), jnp.float32)}

    def update(self, slot, props) -> dict:
        freq = f32(self.device.sample_rate)
        release = f32(np.clip(props["release_time"], 0.001, 1.0))
        _, gains = ambi_mix_params(self.device, slot.gain)
        return {
            "attack": f32(np.exp(-1.0 / (f32(props["attack_time"]) * freq))),
            "release": f32(np.exp(-1.0 / (release * freq))),
            "res_gain": f32(np.sqrt(np.log10(f32(props["resonance"])) * 10.0 / 3.0)),
            "peak_gain": f32(1.0 - np.log10(f32(props["peak_gain"]) / GAIN_SCALE)),
            "freq_min": f32(MIN_FREQ / freq),
            "bandwidth": f32((MAX_FREQ - MIN_FREQ) / freq),
            "gain_tgt": gains,
        }

    def process(self, state, params, wet, T: int):
        att, rel = params["attack"], params["release"]
        pk, fmin, bwn = params["peak_gain"], params["freq_min"], params["bandwidth"]

        def env_step(env, x):
            s = pk * jnp.abs(x)
            a = jnp.where(s > env, att, rel)
            env = s + (env - s) * a
            return env, env

        env, envs = jax.lax.scan(env_step, state["env"], wet[0], unroll=8)
        w0 = jnp.minimum(bwn * envs + fmin, 0.46) * (2.0 * jnp.pi)
        cos_w0 = jnp.cos(w0)
        alpha = jnp.sin(w0) * (0.5 / Q_FACTOR)

        # Swept peaking filter, per-sample coefficients (autowah.cpp:149-172):
        # inlined TDF2 with b = [1+a*rg, -2cos, 1-a*rg], a = [1+a/rg, -2cos,
        # 1-a/rg], normalized by a0.
        rg = params["res_gain"]
        b0 = 1.0 + alpha * rg
        b1 = -2.0 * cos_w0
        b2 = 1.0 - alpha * rg
        a0r = 1.0 / (1.0 + alpha / rg)
        a1 = -2.0 * cos_w0
        a2 = 1.0 - alpha / rg

        def bq_step(z, ins):
            xn, cb0, cb1, cb2, ca0r, ca1, ca2 = ins
            y = xn * (cb0 * ca0r) + z[:, 0]
            z1 = xn * (cb1 * ca0r) - y * (ca1 * ca0r) + z[:, 1]
            z2 = xn * (cb2 * ca0r) - y * (ca2 * ca0r)
            return jnp.stack([z1, z2], axis=-1), y

        z, ys = jax.lax.scan(bq_step, state["z"],
                             (wet.T, b0, b1, b2, a0r, a1, a2), unroll=8)
        out, new_cur = effect_mix(ys.T, state["gain_cur"],
                                  jnp.asarray(params["gain_tgt"]), T)
        return out, None, {"env": env, "z": z, "gain_cur": new_cur}
