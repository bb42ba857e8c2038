"""Echo effect (alc/effects/echo.cpp).

Two-tap ping-pong delay with damped feedback.  The sequential form writes
``delay[o] = in + damp(delay[o - D2]) * feedback`` one sample at a time; here
the block solves the same recurrence by fixed-point iteration: the tap-2
stream depends on this block's writes only at lags >= D2, so ceil(T/D2)
passes of (read, damp-filter, scale) reproduce the sequential result
exactly.  The pass count adapts to D2 (host-computed in update(); it keys
the jit cache through state_signature), so even the shortest valid
AL_ECHO_DELAY/AL_ECHO_LRDELAY settings are exact.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import ambidefs, panning
from ..ops import spec
from ..ops.filters import _biquad_chunked_single
from .base import DelayRing, EffectState, effect_mix, register

f32 = np.float32

MAX_DELAY = 0.207
MAX_LR_DELAY = 0.404
LOWPASS_FREQ_REF = 5000.0
_SQRT2 = f32(np.sqrt(np.float32(2.0)))


@register("echo")
class EchoEffect(EffectState):
    defaults = {"delay": 0.1, "lr_delay": 0.1, "damping": 0.5,
                "feedback": 0.5, "spread": -1.0}

    _n_passes = 16  # overwritten per-config in update()

    def state_signature(self):
        # The fixed-point pass count is part of the traced graph shape.
        return ("echo", self._n_passes)

    def device_update(self, buffer=None) -> dict:
        freq = self.device.sample_rate
        maxlen = DelayRing.length_for(
            int(MAX_DELAY * freq + 0.5) + int(MAX_LR_DELAY * freq + 0.5), 1024)
        st = DelayRing.init(maxlen, 1)
        st["filter_z"] = jnp.zeros((1, 2), jnp.float32)
        st["gain_cur"] = jnp.zeros((2, self.device.n_dry), jnp.float32)
        return st

    def update(self, slot, props) -> dict:
        dev = self.device
        freq = f32(dev.sample_rate)
        d1 = max(int(np.rint(f32(props["delay"]) * freq)), 1)
        d2 = int(np.rint(f32(props["lr_delay"]) * freq)) + d1
        # Exact convergence needs ceil(T/d2) passes for the largest block.
        self._n_passes = max(1, -(-1024 // max(d2, 1)))
        gainhf = f32(max(1.0 - props["damping"], 0.0625))
        coeffs = spec.biquad_set_params("highshelf", f32(LOWPASS_FREQ_REF / freq),
                                        gainhf, _SQRT2)
        x = f32(props["spread"])
        z = f32(np.sqrt(f32(1.0 - x * x)))
        pan0 = ambidefs.calc_ambi_coeffs(x, 0.0, z, 0.0)
        pan1 = ambidefs.calc_ambi_coeffs(-x, 0.0, z, 0.0)
        layout = dev.layout
        tgt = np.zeros((2, dev.n_dry), f32)
        tgt[0] = panning.compute_pan_gains(layout.dry_acn, layout.dry_scale,
                                           pan0, slot.gain)
        tgt[1] = panning.compute_pan_gains(layout.dry_acn, layout.dry_scale,
                                           pan1, slot.gain)
        return {
            "d1": np.int32(d1), "d2": np.int32(d2),
            "feed_gain": f32(props["feedback"]),
            "filter": coeffs,
            "gain_tgt": tgt,
        }

    def process(self, state: dict, params: dict, wet: jax.Array, T: int):
        d1, d2 = params["d1"], params["d2"]
        x = wet[0]
        ring = {"buf": state["buf"], "offset": state["offset"]}
        cf = jnp.tile(jnp.asarray(params["filter"])[None, None, :],
                      (T // 32, 1, 1))

        hist2 = DelayRing.read(ring, d2, T)[0]
        i = jnp.arange(T, dtype=jnp.int32)

        def one_pass(carry, _):
            d_prev, _ = carry
            r = jnp.where(i < d2, hist2, _shift_right(d_prev, d2, T))
            f, z2 = _biquad_chunked_single(r[None, :], state["filter_z"], cf, 32)
            d = x + f[0] * params["feed_gain"]
            return (d, z2), None

        (d, z_new), _ = jax.lax.scan(one_pass, (x, state["filter_z"]), None,
                                     length=self._n_passes)

        ring = DelayRing.write(ring, d[None, :], T)
        temp0 = DelayRing.read(ring, T + d1, T)[0]
        temp1 = DelayRing.read(ring, T + d2, T)[0]

        out, new_cur = effect_mix(jnp.stack([temp0, temp1]),
                                  state["gain_cur"],
                                  jnp.asarray(params["gain_tgt"]), T)
        new_state = {"buf": ring["buf"], "offset": ring["offset"],
                     "filter_z": z_new, "gain_cur": new_cur}
        return out, None, new_state


def _shift_right(d: jax.Array, lag, T: int) -> jax.Array:
    """d delayed by a traced lag (zeros shifted in), via dynamic slice."""
    ext = jnp.concatenate([jnp.zeros(T, d.dtype), d])
    start = jnp.clip(T - lag, 0, T).astype(jnp.int32)
    return jax.lax.dynamic_slice(ext, (start,), (T,))
