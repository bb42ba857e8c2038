"""Distortion effect (alc/effects/distortion.cpp).

B-Format -> tetrahedral A-Format, 4x zero-stuffed oversampling, lowpass
biquad, a three-fold rational waveshaper, bandpass biquad, decimate,
A-Format -> B-Format.  All four lines process as one [4, 4T] batch through
the chunk-parallel biquad kernel; the waveshaper is elementwise.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import spec
from ..ops.filters import _biquad_chunked_single
from .base import EffectState, ambi_mix_params, effect_mix, register

f32 = np.float32

_DEC = f32(0.25 / np.sqrt(3.0))
_ENC = f32(0.5 * np.sqrt(3.0))
B2A = np.array([[0.25, _DEC, _DEC, _DEC],
                [0.25, -_DEC, -_DEC, _DEC],
                [0.25, _DEC, -_DEC, -_DEC],
                [0.25, -_DEC, _DEC, -_DEC]], f32)
A2B = np.array([[1.0, 1.0, 1.0, 1.0],
                [_ENC, -_ENC, _ENC, -_ENC],
                [_ENC, -_ENC, -_ENC, _ENC],
                [_ENC, _ENC, -_ENC, -_ENC]], f32)


def _bw_rcpq(f0norm: f32, bandwidth: f32) -> f32:
    w0 = f32(2.0 * np.pi) * f0norm
    return f32(2.0 * np.sinh(np.log(2.0) / 2.0 * bandwidth * w0 / np.sin(w0)))


@register("distortion")
class DistortionEffect(EffectState):
    defaults = {"edge": 0.2, "gain": 0.05, "lowpass_cutoff": 8000.0,
                "eq_center": 3600.0, "eq_bandwidth": 3600.0}

    def device_update(self, buffer=None) -> dict:
        return {"lp_z": jnp.zeros((4, 2), jnp.float32),
                "bp_z": jnp.zeros((4, 2), jnp.float32),
                "gain_cur": jnp.zeros((4, self.device.n_dry), jnp.float32)}

    def update(self, slot, props) -> dict:
        freq = f32(self.device.sample_rate)
        edge = f32(min(np.sin(np.pi * 0.5 * f32(props["edge"])), 0.99))
        edge_coeff = f32(2.0 * edge / (1.0 - edge))

        cutoff = f32(props["lowpass_cutoff"])
        bw = f32(0.746268656716)
        lp = spec.biquad_set_params("lowpass", f32(cutoff / freq * 0.25),
                                    f32(1.0), _bw_rcpq(f32(cutoff / freq * 0.25), bw))
        center = f32(props["eq_center"])
        bw = f32(props["eq_bandwidth"] / (center * 0.67))
        bp = spec.biquad_set_params("bandpass", f32(center / freq * 0.25),
                                    f32(1.0), _bw_rcpq(f32(center / freq * 0.25), bw))
        _, gains = ambi_mix_params(self.device, f32(slot.gain * props["gain"]))
        return {"edge_coeff": edge_coeff, "lp": lp, "bp": bp,
                "gain_tgt": gains[:4]}

    def process(self, state, params, wet, T: int):
        hi = jax.lax.Precision.HIGHEST
        a_in = jnp.einsum("cd,dt->ct", jnp.asarray(B2A), wet[:4], precision=hi)

        # 4x oversample by zero stuffing (x4 gain on the impulses).
        up = jnp.zeros((4, T * 4), jnp.float32)
        up = up.at[:, ::4].set(a_in * 4.0)

        cf = jnp.broadcast_to(jnp.asarray(params["lp"])[None, None],
                              (T * 4 // 32, 4, 5))
        y, lp_z = _biquad_chunked_single(up, state["lp_z"], cf, 32)

        # Waveshaper folds (distortion.cpp:239-244): +(1+fc), -(1+fc), +(1+fc)
        fc = params["edge_coeff"]
        y = (1.0 + fc) * y / (1.0 + fc * jnp.abs(y))
        y = (-1.0 - fc) * y / (1.0 + fc * jnp.abs(y))
        y = (1.0 + fc) * y / (1.0 + fc * jnp.abs(y))

        cf = jnp.broadcast_to(jnp.asarray(params["bp"])[None, None],
                              (T * 4 // 32, 4, 5))
        y, bp_z = _biquad_chunked_single(y, state["bp_z"], cf, 32)

        a_out = y[:, ::4]
        b_out = jnp.einsum("cd,dt->ct", jnp.asarray(A2B), a_out, precision=hi)
        out, new_cur = effect_mix(b_out, state["gain_cur"],
                                  jnp.asarray(params["gain_tgt"]), T)
        return out, None, {"lp_z": lp_z, "bp_z": bp_z, "gain_cur": new_cur}
