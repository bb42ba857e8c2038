"""Compressor effect (alc/effects/compressor.cpp): a simple AGC, distinct
from the mastering limiter.  The envelope follows the first (W) wet channel
with fixed 100 ms attack / 200 ms release multipliers; every wet channel is
scaled by 1/env into the dry bus."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import jax.numpy as _jnp

from .base import EffectState, ambi_mix_params, register

f32 = np.float32

AMP_ENVELOPE_MIN = 0.5
AMP_ENVELOPE_MAX = 2.0
ATTACK_TIME = 0.1
RELEASE_TIME = 0.2


@register("compressor")
class CompressorEffect(EffectState):
    defaults = {"onoff": True}

    def device_update(self, buffer=None) -> dict:
        freq = float(self.device.sample_rate)
        self._attack = f32((AMP_ENVELOPE_MAX / AMP_ENVELOPE_MIN)
                           ** (1.0 / (freq * ATTACK_TIME)))
        self._release = f32((AMP_ENVELOPE_MIN / AMP_ENVELOPE_MAX)
                            ** (1.0 / (freq * RELEASE_TIME)))
        return {"env": jnp.ones((), jnp.float32)}

    def update(self, slot, props) -> dict:
        _, gains = ambi_mix_params(self.device, slot.gain)
        return {"enabled": np.int32(bool(props.get("onoff", True))),
                "gain_tgt": gains}

    def process(self, state, params, wet, T: int):
        am, rm = jnp.float32(self._attack), jnp.float32(self._release)
        amp = jnp.where(params["enabled"] != 0,
                        jnp.clip(jnp.abs(wet[0]), AMP_ENVELOPE_MIN,
                                 AMP_ENVELOPE_MAX),
                        jnp.ones(T, jnp.float32))

        def step(env, a):
            env = jnp.where(a > env, jnp.minimum(env * am, a),
                            jnp.where(a < env, jnp.maximum(env * rm, a), env))
            return env, 1.0 / env

        env, gains = jax.lax.scan(step, state["env"], amp, unroll=8)
        # The reference applies the channel gains directly (no block ramp:
        # dst[i] += input[i]*mGains[i]*gain, compressor.cpp:150-160).
        g = jnp.asarray(params["gain_tgt"])
        g = jnp.where(jnp.abs(g) > 1.0e-5, g, 0.0)
        out = jnp.einsum("kt,kc->ct", wet * gains[None, :], g,
                         precision=jax.lax.Precision.HIGHEST)
        return out, None, {"env": env}
