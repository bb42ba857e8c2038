"""Pallas TPU dual-biquad: the voice-channel filter hot loop.

The XLA chunk-parallel state-space formulation (ops/filters.py) runs ~1500
small elementwise passes over [chunks, voices] arrays and is HBM-bound.
Here the recurrence runs the obvious way on the VPU: time-major input with
the voice population laid out as full (sublane, lane) tiles — sample t's
voice vector is one aligned (NS, 128) tile, so each of the ~14 dependent
vector ops per sample is a single-vreg VPU op, and the whole filter is one
read+write pass over the signal.  The grid is (voice tiles, time tiles)
with filter state carried across time tiles in VMEM scratch (time tiles are
the inner, sequentially-executed grid dimension).

Bonus: this reproduces BiquadFilter::dualProcess (core/filters/biquad.cpp:
284-343) with the reference's exact f32 TDF2 op order — unlike the chunked
form, whose state-space reassociation differs by a few ulps — including the
32-sample coefficient-interpolation cadence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEP = 32          # interpolation cadence (biquad.cpp SAMPLES_PER_STEP)
LANE = 128
NS = 8             # sublanes of voices per grid program
VT = NS * LANE     # 1024 voices per program
TB = 256           # time-tile frames (VMEM: 4 blocks x 2 buffers x 1 MB)


def _kernel(x_ref, z_ref, cf_ref, tgt_ref, cnt_ref,
            y_ref, zo_ref, cfo_ref, cnto_ref, carry_ref, *, n_t: int,
            tb: int):
    t_blk = pl.program_id(1)

    @pl.when(t_blk == 0)
    def _():
        carry_ref[0:4] = z_ref[:]
        carry_ref[4:14] = cf_ref[:].astype(jnp.float32)
        carry_ref[14:15] = cnt_ref[:].astype(jnp.float32)

    z = tuple(carry_ref[i] for i in range(4))              # (NS, 128) each
    cf = tuple(carry_ref[4 + i] for i in range(10))
    tgt = tuple(tgt_ref[i] for i in range(10))
    cnt = carry_ref[14].astype(jnp.int32)

    def chunk_body(c, carry):
        z, cf, cnt = carry
        b00, b01, b02, a01, a02, b10, b11, b12, a11, a12 = cf

        def tile_body(j, zc):
            base = c * STEP + j * 8
            xt = x_ref[pl.ds(base, 8)]                     # (8, NS, 128)
            ys = []
            z00, z01, z10, z11 = zc
            for i in range(8):
                x = xt[i]
                y0 = x * b00 + z00
                z00 = x * b01 - y0 * a01 + z01
                z01 = x * b02 - y0 * a02
                y1 = y0 * b10 + z10
                z10 = y0 * b11 - y1 * a11 + z11
                z11 = y0 * b12 - y1 * a12
                ys.append(y1)
            y_ref[pl.ds(base, 8)] = jnp.stack(ys)
            return (z00, z01, z10, z11)

        z = jax.lax.fori_loop(0, STEP // 8, tile_body, z, unroll=True)

        # End-of-chunk coefficient lerp (biquad.cpp:310-331).
        cnt2 = jnp.maximum(cnt - STEP, 0)
        steps_left = cnt2 // STEP
        a = 1.0 / (steps_left.astype(jnp.float32) + 1.0)
        was_active = cnt > 0
        done = cnt2 == 0
        cf = tuple(
            jnp.where(was_active,
                      jnp.where(done, t_, c_ + (t_ - c_) * a), c_)
            for c_, t_ in zip(cf, tgt))
        return z, cf, cnt2

    z, cf, cnt = jax.lax.fori_loop(0, tb // STEP, chunk_body, (z, cf, cnt))
    carry_ref[0:4] = jnp.stack(z)
    carry_ref[4:14] = jnp.stack(cf)
    carry_ref[14] = cnt.astype(jnp.float32)

    @pl.when(t_blk == n_t - 1)
    def _():
        zo_ref[:] = jnp.stack(z)
        cfo_ref[:] = jnp.stack(cf)
        cnto_ref[0] = cnt


@functools.partial(jax.jit, static_argnames=("T",))
def _biquad_tm(xt, z4, cf10, tgt10, cnt, *, T):
    R = xt.shape[1]                       # V // 128 rows
    tb = min(TB, T)
    n_t = T // tb
    kernel = functools.partial(_kernel, n_t=n_t, tb=tb)
    vspec = lambda lead: pl.BlockSpec((lead, NS, LANE),  # noqa: E731
                                      lambda i, t: (0, i, 0),
                                      memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((tb, NS, LANE), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(R // NS, n_t),
        in_specs=[tspec, vspec(4), vspec(10), vspec(10), vspec(1)],
        out_specs=[tspec, vspec(4), vspec(10), vspec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((4, R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((10, R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, R, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((15, NS, LANE), jnp.float32)],
    )(xt, z4, cf10, tgt10, cnt)


def biquad_dual_interp_pallas(x, z, coeffs, target, counter):
    """Drop-in for ops.filters.biquad_dual_interp_chunked on TPU.

    x [V, T], z [V, 2, 2], coeffs/target [V, 2, 5], counter [V] (>= 0).
    Requires V % 1024 == 0 and T % 256 == 0 (host-checked via the plan).
    Returns (y [V, T], z', coeffs', counter') — bit-exact vs the
    sample-sequential reference path (ops/filters.biquad_dual_interp).
    """
    V, T = x.shape
    R = V // LANE
    xt = x.T.reshape(T, R, LANE)
    z4 = z.transpose(1, 2, 0).reshape(4, R, LANE)
    cf10 = coeffs.transpose(1, 2, 0).reshape(10, R, LANE)
    tgt10 = target.transpose(1, 2, 0).reshape(10, R, LANE)
    cnt3 = counter.reshape(1, R, LANE)
    y_t, zo, cfo, cnto = _biquad_tm(xt, z4, cf10, tgt10, cnt3, T=T)
    return (y_t.reshape(T, V).T,
            zo.reshape(2, 2, V).transpose(2, 0, 1),
            cfo.reshape(2, 5, V).transpose(2, 0, 1),
            cnto.reshape(V))
