"""Effect engine base + shared device helpers.

Mirrors core/effects/base.h EffectState: deviceUpdate (state allocation at
the device rate), update (props → coefficients/gains), process (block DSP).
The process half here is a pure jax function closed over nothing, taking
(state pytree, params dict of arrays, wet [B, T]) and returning
(output contribution [n_out, T], new state).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

f32 = np.float32

effect_registry: dict[str, type] = {}


def register(name: str):
    def deco(cls):
        effect_registry[name] = cls
        cls.name = name
        return cls
    return deco


def get_effect_factory(name: str):
    return effect_registry[name]


class EffectState:
    """Host-side effect instance bound to a slot on a device."""

    name = "base"
    granularity = 128   # block sizes must be multiples of this

    def __init__(self, device) -> None:
        self.device = device

    def max_window(self) -> int:
        """Largest per-call process() window the state supports (bounded by
        any full-window ring write; the fused super-block path feeds whole
        windows when every attached effect allows it)."""
        return 1024

    # -- host half --
    def device_update(self, buffer=None) -> dict:
        """Allocate carried device state at the device rate; returns the
        initial state pytree (numpy/jnp arrays)."""
        return {}

    def update(self, slot, props) -> dict:
        """props → params dict of arrays uploaded with the device config."""
        return {}

    # -- device half (traced) --
    def process(self, state: dict, params: dict, wet: jax.Array, T: int):
        """wet [B, T] → (contribution [n_out, T], new state)."""
        raise NotImplementedError


def ambi_mix_params(device, gainbase: float):
    """setAmbiMixParams (core/device.h:127-147): map wet-bus ambi channels
    onto dry-bus channels by matching ACN index.

    Returns (target_index [B] int32 with -1 for unmatched,
             gains [B, n_dry] f32 one-hot rows scaled by target scale * gain).
    """
    layout = device.layout
    B = device.wet_channels
    tgt_idx = np.full(B, -1, np.int32)
    gains = np.zeros((B, device.n_dry), f32)
    for i in range(B):  # wet bus is ACN-ordered with unit scale
        matches = np.nonzero(layout.dry_acn == i)[0]
        if matches.size:
            j = int(matches[0])
            tgt_idx[i] = j
            gains[i, j] = f32(layout.dry_scale[j] * f32(gainbase))
    return tgt_idx, gains


def effect_mix(taps: jax.Array, cur: jax.Array, tgt: jax.Array, T: int):
    """Effect-output mixing with whole-block gain ramps.

    The reference mixes effect outputs with MixSamples(Counter=samplesToDo)
    (e.g. alc/effects/echo.cpp:157-159): gains ramp linearly across the full
    block toward the target, landing exactly on it.

    taps: [K, T] effect output lines; cur/tgt: [K, C] gains.
    Returns (out [C, T], new_cur [K, C]).
    """
    i = jnp.arange(T, dtype=jnp.float32)
    step = (tgt - cur) * jnp.float32(1.0 / T)      # MixLine's delta rounding
    ramp_active = jnp.abs(step) > jnp.float32(1.1920929e-07)
    tgt_masked = jnp.where(jnp.abs(tgt) > 1.0e-5, tgt, 0.0)
    gains = jnp.where(ramp_active[:, :, None],
                      cur[:, :, None] + step[:, :, None] * i[None, None, :],
                      tgt_masked[:, :, None])
    out = jnp.einsum("kt,kct->ct", taps, gains,
                     precision=jax.lax.Precision.HIGHEST)
    return out, tgt


class DelayRing:
    """A power-of-two delay line as device state with slice-friendly reads.

    The write offset advances by exactly T per block, and the ring length is
    a multiple of T, so writes are a single dynamic_update_slice and reads of
    any fixed lag are two-piece contiguous slices (materialized by extending
    the ring with its own head — no gathers, which are compile-pathological
    on this backend).
    """

    @staticmethod
    def length_for(min_samples: int, T: int) -> int:
        n = T
        while n < min_samples:
            n <<= 1
        return n

    @staticmethod
    def init(length: int, lines: int = 1):
        return {"buf": jnp.zeros((lines, length), jnp.float32),
                "offset": jnp.zeros((), jnp.int32)}

    @staticmethod
    def read(state: dict, lag, T: int):
        """Read T samples starting at (offset - lag); lag may be traced.

        Returns [lines, T] of ring content for block positions [0, T) at the
        given lag *before* this block's write position.
        """
        buf = state["buf"]
        length = buf.shape[1]
        ext = jnp.concatenate([buf, buf[:, :T]], axis=1)
        start = ((state["offset"] - lag) % length).astype(jnp.int32)
        return jax.vmap(lambda row: jax.lax.dynamic_slice(row, (start,), (T,)))(ext)

    @staticmethod
    def read_window(state: dict, lookback: int, T: int):
        """[lines, lookback+T] window: ring content for block positions
        [-lookback, T) relative to this block's write start (call after
        write to see this block's samples)."""
        buf = state["buf"]
        length = buf.shape[1]
        ext = jnp.concatenate([buf, buf[:, :lookback + T]], axis=1)
        start = ((state["offset"] - lookback) % length).astype(jnp.int32)
        return jax.vmap(lambda row: jax.lax.dynamic_slice(
            row, (start,), (lookback + T,)))(ext)

    @staticmethod
    def write(state: dict, values: jax.Array, T: int) -> dict:
        buf = state["buf"]
        off = state["offset"]
        buf = jax.vmap(lambda row, v: jax.lax.dynamic_update_slice(row, v, (off,)))(
            buf, values)
        return {"buf": buf, "offset": (off + T) % buf.shape[1]}
