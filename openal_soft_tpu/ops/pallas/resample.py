"""Pallas TPU kernel for batched voice resampling.

XLA's gather lowering on TPU costs ~3 cycles/element and minutes of compile
time, making it the single largest block cost.  This kernel instead gives
each voice one grid program that:

  1. DMAs the voice's source span (and, for looping voices, the loop body)
     from the HBM sample pool into VMEM,
  2. computes the affine 16.16 positions for all T outputs as one
     [T/128, 128] tile,
  3. resolves loop wrap / end clamp / leading silence with vector integer
     math,
  4. gathers window samples with Mosaic's lane-local dynamic gather
     (jnp.take_along_axis on 128-lane tiles), one gather per (tap,
     128-lane window chunk),
  5. applies the phase-interpolated weights (table rows lane-gathered the
     same way) and accumulates the taps.

Semantics identical to ops/resample.resample_voices (the jnp reference
path used on CPU and for correctness tests).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import MIXER_FRAC_BITS, MIXER_FRAC_MASK, RESAMPLE_TAPS

LANE = 128

# Window span buckets (samples): multiples of 1024 (the HBM DMA slice-size
# alignment for 1D f32 arrays), sized for T=1024 outputs at max increments
# of ~1x/2x/4x/10x.
SPAN_BUCKETS = (2048, 3072, 5120, 11264)


def span_for_increment(max_increment: int, T: int = 1024) -> int:
    need = ((max_increment * T) >> MIXER_FRAC_BITS) + 64
    for s in SPAN_BUCKETS:
        if need <= s:
            return s
    return SPAN_BUCKETS[-1]


def pad_bank(bank: dict) -> dict:
    """[52, 32, 48] → taps-major, phase-padded [52, 48, 128] f32 arrays."""
    out = {}
    for k, v in bank.items():
        v = np.asarray(v)
        vt = np.transpose(v, (0, 2, 1))                    # [52, 48, 32]
        out[k] = jnp.asarray(np.pad(vt, ((0, 0), (0, 0), (0, LANE - 32))))
    return out


def _kernel(src_off_ref, src_len_ref, loop_start_ref, loop_end_ref,
            flags_ref, pos_int_ref, pos_frac_ref, inc_ref, bank_row_ref,
            sf_bits_ref,
            # tensor inputs
            fil_ref, phd_ref, scd_ref, spd_ref, pool_ref,
            # outputs
            out_ref,
            # scratch
            w1_ref, w2_ref, sem1, sem2,
            *, T: int, taps: int, span: int, pool_len: int):
    v = pl.program_id(0)
    rows = T // LANE
    center = taps // 2 - 1

    src_off = src_off_ref[v]
    src_len = src_len_ref[v]
    loop_start = loop_start_ref[v]
    loop_end = loop_end_ref[v]
    flags = flags_ref[v]
    has_loop = (flags & 1) != 0
    has_wrapped = (flags & 2) != 0
    pos0 = pos_int_ref[v]
    frac0 = pos_frac_ref[v]
    inc = inc_ref[v]
    row = bank_row_ref[v]
    # sf arrives as 24-bit fixed point (quantized identically on the
    # jnp path by tables.prepare_voice_resampler).
    sf = sf_bits_ref[v].astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))

    loop_len = jnp.maximum(loop_end - loop_start, 1)

    # --- window DMAs ---------------------------------------------------
    base_stream = pos0 + (frac0 >> MIXER_FRAC_BITS) - center
    base_res = jnp.where(
        has_loop & (base_stream >= loop_end),
        (base_stream - loop_start) % loop_len + loop_start,
        jnp.where(has_loop & has_wrapped & (base_stream < loop_start),
                  (base_stream - loop_start) % loop_len + loop_start,
                  base_stream))
    base_res = jnp.clip(base_res, 0, jnp.maximum(src_len - 1, 0))
    # HBM DMA starts/sizes must be 1024-aligned for 1D f32 arrays: fetch from
    # the aligned page below and offset indices by the remainder.
    fetch = span + 1024
    w1_abs = jnp.clip(src_off + base_res, 0, pool_len - fetch)
    w1_start = pl.multiple_of((w1_abs >> 10) << 10, 1024)
    extra1 = w1_abs - w1_start
    dma1 = pltpu.make_async_copy(pool_ref.at[pl.ds(w1_start, fetch)],
                                 w1_ref, sem1)
    dma1.start()

    w2_abs = jnp.clip(src_off + loop_start, 0, pool_len - fetch)
    w2_start = pl.multiple_of((w2_abs >> 10) << 10, 1024)
    extra2 = w2_abs - w2_start
    dma2 = pltpu.make_async_copy(pool_ref.at[pl.ds(w2_start, fetch)],
                                 w2_ref, sem2)

    @pl.when(has_loop)
    def _():
        dma2.start()

    # --- positions for all outputs -------------------------------------
    t_idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
             + jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1))
    tot = frac0 + t_idx * inc
    p = pos0 + (tot >> MIXER_FRAC_BITS)
    fr = tot & MIXER_FRAC_MASK
    pi = fr >> 11
    pf = (fr & 2047).astype(jnp.float32) * jnp.float32(1.0 / 2048.0)

    lo = RESAMPLE_TAPS // 2 - taps // 2

    dma1.wait()

    @pl.when(has_loop)
    def _():
        dma2.wait()

    n_chunks = (span + 1024) // LANE
    acc = jnp.zeros((rows, LANE), jnp.float32)
    for j in range(taps):
        s = p + (j - center)
        in_wrap = has_loop & ((s >= loop_end) | (has_wrapped & (s < loop_start)))
        wrapped = jnp.where(in_wrap, (s - loop_start) % loop_len + loop_start, s)
        resolved = jnp.where(has_loop, wrapped,
                             jnp.minimum(s, jnp.maximum(src_len - 1, 0)))
        valid = (s >= 0) & (src_len > 0)

        idx1 = resolved - base_res + extra1
        use_w1 = (idx1 >= extra1) & (idx1 - extra1 < span)
        idx2 = resolved - loop_start + extra2

        val = jnp.zeros((rows, LANE), jnp.float32)
        for k in range(n_chunks):
            chunk1 = jnp.broadcast_to(w1_ref[k * LANE:(k + 1) * LANE][None, :],
                                      (rows, LANE))
            sel1 = use_w1 & ((idx1 >> 7) == k)
            g1 = jnp.take_along_axis(chunk1, idx1 & (LANE - 1), axis=1)
            val = jnp.where(sel1, g1, val)
        for k in range(n_chunks):
            chunk2 = jnp.broadcast_to(w2_ref[k * LANE:(k + 1) * LANE][None, :],
                                      (rows, LANE))
            sel2 = has_loop & (~use_w1) & ((idx2 >> 7) == k)
            g2 = jnp.take_along_axis(chunk2, idx2 & (LANE - 1), axis=1)
            val = jnp.where(sel2, g2, val)
        val = jnp.where(valid, val, 0.0)

        # Phase weights: w = (fil + sf*scd)[pi] + pf*(phd + sf*spd)[pi].
        filj = fil_ref[pl.ds(row, 1), lo + j, :]             # [1, 128]
        scdj = scd_ref[pl.ds(row, 1), lo + j, :]
        phdj = phd_ref[pl.ds(row, 1), lo + j, :]
        spdj = spd_ref[pl.ds(row, 1), lo + j, :]
        w0j = jnp.broadcast_to(filj + sf * scdj, (rows, LANE))
        wdj = jnp.broadcast_to(phdj + sf * spdj, (rows, LANE))
        wj = (jnp.take_along_axis(w0j, pi, axis=1)
              + pf * jnp.take_along_axis(wdj, pi, axis=1))
        acc = acc + wj * val

    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("T", "taps", "span", "pool_len"))
def _resample_pallas(scalars, bank_pad, pool, *, T, taps, span, pool_len):
    V = scalars["src_off"].shape[0]
    rows = T // LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(V,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # fil [52,48,128]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # phd
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scd
            pl.BlockSpec(memory_space=pltpu.VMEM),   # spd
            pl.BlockSpec(memory_space=pltpu.ANY),    # pool (HBM)
        ],
        out_specs=pl.BlockSpec((1, rows, LANE), lambda v, *_: (v, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((span + 1024,), jnp.float32),
            pltpu.VMEM((span + 1024,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_kernel, T=T, taps=taps, span=span,
                               pool_len=pool_len)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, rows, LANE), jnp.float32),
    )(scalars["src_off"], scalars["src_len"], scalars["loop_start"],
      scalars["loop_end"], scalars["flags"], scalars["pos_int"],
      scalars["pos_frac"], scalars["increment"], scalars["bank_row"],
      scalars["sf_bits"],
      bank_pad["fil"], bank_pad["phd"], bank_pad["scd"], bank_pad["spd"],
      pool)
    return out.reshape(V, T)


def resample_voices_pallas(pool, src_off, src_len, loop_start, loop_end,
                           has_loop, has_wrapped, pos_int, pos_frac,
                           increment, bank_row, sf, bank_pad, n: int,
                           taps: int, span: int):
    """Drop-in for ops.resample.resample_voices on TPU (n multiple of 128)."""
    flags = has_loop.astype(jnp.int32) | (has_wrapped.astype(jnp.int32) << 1)
    scalars = {
        "src_off": src_off.astype(jnp.int32),
        "src_len": src_len.astype(jnp.int32),
        "loop_start": loop_start.astype(jnp.int32),
        "loop_end": loop_end.astype(jnp.int32),
        "flags": flags,
        "pos_int": pos_int.astype(jnp.int32),
        "pos_frac": pos_frac.astype(jnp.int32),
        "increment": increment.astype(jnp.int32),
        "bank_row": bank_row.astype(jnp.int32),
        "sf_bits": jnp.round(sf.astype(jnp.float32) * (1 << 24)).astype(jnp.int32),
    }
    return _resample_pallas(scalars, bank_pad, pool, T=n, taps=taps,
                            span=span, pool_len=pool.shape[0])
