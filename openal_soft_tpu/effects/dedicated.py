"""Dedicated dialog/LFE routing (alc/effects/dedicated.cpp): the wet W
channel routes at a fixed gain to one real output channel (front center or
LFE), bypassing the ambisonic bus."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.devformat import Channel
from .base import EffectState, effect_mix, register

f32 = np.float32


@register("dedicated_dialog")
class DedicatedDialogEffect(EffectState):
    defaults = {"gain": 1.0}
    target_channel = Channel.FRONT_CENTER

    def device_update(self, buffer=None) -> dict:
        return {"gain_cur": jnp.zeros((1, self.device.n_real), jnp.float32),
                "dry_cur": jnp.zeros((1, self.device.n_dry), jnp.float32)}

    def update(self, slot, props) -> dict:
        from ..core import ambidefs, panning

        gain = f32(slot.gain * props["gain"])
        tgt = np.zeros((1, self.device.n_real), f32)
        dry_tgt = np.zeros((1, self.device.n_dry), f32)
        idx = self.device.layout.channel_index.get(self.target_channel)
        if idx is not None:
            tgt[0, idx] = gain
        elif self.target_channel == Channel.FRONT_CENTER:
            # No front-center speaker: play from the front-center location
            # on the main ambisonic bus (dedicated.cpp:74-91; LFE without
            # an LFE channel stays silent).
            lay = self.device.layout
            coeffs = ambidefs.calc_direction_coeffs((0.0, 0.0, -1.0))
            dry_tgt[0] = panning.compute_pan_gains(
                lay.dry_acn, lay.dry_scale, coeffs, gain)
        return {"gain_tgt": tgt, "dry_tgt": dry_tgt}

    def process(self, state, params, wet, T: int):
        out_real, new_cur = effect_mix(wet[0:1], state["gain_cur"],
                                       jnp.asarray(params["gain_tgt"]), T)
        dry, new_dry_cur = effect_mix(wet[0:1], state["dry_cur"],
                                      jnp.asarray(params["dry_tgt"]), T)
        return dry, out_real, {"gain_cur": new_cur,
                               "dry_cur": new_dry_cur}


@register("dedicated_lfe")
class DedicatedLfeEffect(DedicatedDialogEffect):
    target_channel = Channel.LFE
