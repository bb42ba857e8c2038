"""Batched voice resampling on TPU.

The reference resamples one voice channel at a time through a function-pointer
kernel family (core/mixer/mixer_c.cpp Resample_*_C, dispatched per CPU ISA).
Here the whole voice population is one batched kernel: positions are an
affine function of the 16.16 fixed-point step (core/mixer/defs.h:23), and
every resampler quality is expressed over a unified gather window as

    out[v, i] = sum_j  w[v, phase(v,i), j] * src[v, pos(v,i) + j - taps/2 + 1]

with ``w = (fil + sf*scd) + pf*(phd + sf*spd)`` rows taken from the global
weight bank (ops/tables.py), reproducing do_point/do_lerp/do_cubic/do_bsinc
arithmetic exactly (same op order, f32).

Buffer-source resolution (loop wrap, end clamp, leading silence) follows
LoadBufferStatic/LoadBufferQueue semantics (core/voice.cpp:487-581): instead
of host-side copies into a staging line, voices gather directly from a device
sample pool with affine/modular index math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (
    CUBIC_PHASE_COUNT,
    MIXER_FRAC_BITS,
    MIXER_FRAC_MASK,
    RESAMPLE_TAPS,
)

_PHASE_SHIFT = MIXER_FRAC_BITS - 5          # 11: frac bits below the phase index
_PHASE_SUB_MASK = (1 << _PHASE_SHIFT) - 1
_PHASE_SUB_SCALE = 1.0 / (1 << _PHASE_SHIFT)


def positions(pos_frac: jax.Array, increment: jax.Array, n: int):
    """Per-voice affine position streams.

    Args:
      pos_frac: [V] int32 starting fraction (< 2**16).
      increment: [V] int32 16.16 step.
    Returns:
      (pos [V,n] int32 relative integer positions, fr [V,n] int32 fractions).
    """
    i = jnp.arange(n, dtype=jnp.int32)
    total = pos_frac[:, None] + i[None, :] * increment[:, None]
    return total >> MIXER_FRAC_BITS, total & MIXER_FRAC_MASK


def resolve_source_index(s: jax.Array, loop_start: jax.Array, loop_end: jax.Array,
                         has_loop: jax.Array, has_wrapped: jax.Array,
                         src_len: jax.Array):
    """Map source-frame index to a readable frame, with validity mask.

    Loop wrap per LoadBufferStatic (voice.cpp:509-529); non-looping sources
    clamp to the final frame (the `lastSample` fill, voice.cpp:493-505);
    negative positions (delayed starts) are silent (voice.cpp:847-864).

    ``has_wrapped`` marks voices whose play position already wrapped at least
    once: their resampler history (window taps before the block position,
    the reference's mPrevSamples carry) must wrap *backwards* into the loop
    for indices below loop_start, preserving played-stream continuity across
    the loop seam.
    """
    loop_len = jnp.maximum(loop_end - loop_start, 1)
    in_wrap = (s >= loop_end[:, None]) | (has_wrapped[:, None] & (s < loop_start[:, None]))
    # jnp.mod yields a non-negative result for positive divisors, so the same
    # formula maps both forward (s >= loop_end) and backward (s < loop_start)
    # positions into the loop region.
    wrapped = jnp.where(in_wrap,
                        (s - loop_start[:, None]) % loop_len[:, None] + loop_start[:, None], s)
    clamped = jnp.where(has_loop[:, None], wrapped,
                        jnp.minimum(s, jnp.maximum(src_len[:, None] - 1, 0)))
    valid = (s >= 0) & (src_len[:, None] > 0)
    return clamped, valid


def voice_weights(bank: dict, bank_row: jax.Array, sf: jax.Array, taps: int):
    """Per-voice phase-weight tables.

    Returns (W0, WD) each [V, 32, taps]:  W0 = fil + sf*scd, WD = phd + sf*spd
    (identical arithmetic to do_bsinc, mixer_c.cpp:83-105; sf = 0 reduces to
    the cubic/fast paths).
    """
    lo = RESAMPLE_TAPS // 2 - taps // 2
    # jnp.asarray: the bank may be host numpy (a trace-time constant that
    # must materialize on the tracing backend), and bank_row is traced.
    fil = jnp.asarray(bank["fil"])[bank_row, :, lo:lo + taps]
    phd = jnp.asarray(bank["phd"])[bank_row, :, lo:lo + taps]
    scd = jnp.asarray(bank["scd"])[bank_row, :, lo:lo + taps]
    spd = jnp.asarray(bank["spd"])[bank_row, :, lo:lo + taps]
    sfb = sf[:, None, None]
    return fil + sfb * scd, phd + sfb * spd


def resample_voices(pool: jax.Array, src_off: jax.Array, src_len: jax.Array,
                    loop_start: jax.Array, loop_end: jax.Array, has_loop: jax.Array,
                    has_wrapped: jax.Array,
                    pos_int: jax.Array, pos_frac: jax.Array, increment: jax.Array,
                    bank_row: jax.Array, sf: jax.Array, bank: dict,
                    n: int, taps: int) -> jax.Array:
    """Resample a batch of voice channels from the device sample pool.

    Args:
      pool: [P] f32 flat sample pool (planar channel spans).
      src_off: [V] int32 pool offset of each voice channel's frame 0.
      src_len / loop_start / loop_end / has_loop: [V] source extents.
      pos_int/pos_frac/increment: [V] voice position state (16.16).
      bank_row/sf: [V] resampler selection (ops/tables.prepare_voice_resampler).
      bank: weight bank dict of [52,32,48] f32 arrays.
      n: static output sample count (samples to load, incl. decoder padding).
      taps: static unified window width (max over active resamplers).
    Returns: [V, n] f32 resampled samples.
    """
    pos, fr = positions(pos_frac, increment, n)
    pos = pos + pos_int[:, None]
    pi = fr >> _PHASE_SHIFT
    pf = (fr & _PHASE_SUB_MASK).astype(jnp.float32) * jnp.float32(_PHASE_SUB_SCALE)

    w0, wd = voice_weights(bank, bank_row, sf, taps)

    # Phase-table lookup as a one-hot MXU contraction over the 32 phases:
    # TPU-native replacement for a per-sample table gather (exact — a one-hot
    # f32 dot selects the weight without rounding).
    onehot = jax.nn.one_hot(pi, CUBIC_PHASE_COUNT, dtype=jnp.float32)  # [V,n,32]
    w0_t = jnp.einsum("vtp,vpj->vtj", onehot, w0,
                      precision=jax.lax.Precision.HIGHEST)
    wd_t = jnp.einsum("vtp,vpj->vtj", onehot, wd,
                      precision=jax.lax.Precision.HIGHEST)

    out = jnp.zeros(pos.shape, dtype=jnp.float32)
    center = taps // 2 - 1
    for j in range(taps):
        s = pos + (j - center)
        idx, valid = resolve_source_index(s, loop_start, loop_end, has_loop,
                                          has_wrapped, src_len)
        v = jnp.take(pool, src_off[:, None] + idx, mode="clip")
        v = jnp.where(valid, v, 0.0)
        w = w0_t[:, :, j] + pf * wd_t[:, :, j]
        out = out + w * v
    return out


def advance_positions(pos_int: jax.Array, pos_frac: jax.Array, increment: jax.Array,
                      samples_mixed: jax.Array):
    """End-of-block position update (voice.cpp:1086-1089), pre loop/queue wrap."""
    total = pos_frac + increment * samples_mixed
    return pos_int + (total >> MIXER_FRAC_BITS), total & MIXER_FRAC_MASK
