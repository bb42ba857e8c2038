"""Null effect (alc/effects/null.cpp): consumes the wet bus, outputs nothing."""

from __future__ import annotations

import jax.numpy as jnp

from .base import EffectState, register


@register("null")
class NullEffect(EffectState):
    defaults: dict = {}

    def process(self, state, params, wet, T: int):
        return jnp.zeros((self.device.n_dry, T), jnp.float32), None, state
