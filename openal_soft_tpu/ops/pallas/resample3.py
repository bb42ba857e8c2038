"""General-increment Pallas TPU resampler (v3): shared-pool staging +
MXU one-hot window assembly.

Replaces resample2's serial per-row window assembly (the round-4 loaded-scene
cliff: per-row scalar resolve chains + [1,128] dynamic-slice copies, ~2.6
ms/block at 4096 mixed-pitch voices) with an all-vector pipeline:

  * the merged active-buffer pool regions are DMA'd into ONE persistent VMEM
    image by grid program 0 (same staging plan as the shared unit kernel,
    resample_unit.shared_layout) — zero per-voice DMAs;
  * per voice, the FULLY RESOLVED stream image sv[m] = stream(rb + m) is
    built with two dynamic lane-rolls + iota masks (loop seam merge, end
    clamp, pre-start silence), generalizing the unit kernel's build phase to
    arbitrary increments — every row of sv is finite by construction;
  * per-row windows are assembled by one-hot MXU matmuls over row groups:
    wins[c*gr + r] = sv[rowchunk_r + c] as onehot[gr*wc, kw] @ sv[gb:gb+kw]
    — the dynamic sublane gather the VPU cannot do, done as an exact 0/1
    f32 contraction (~1 MFLOP per voice-block, >20x cheaper than the serial
    form it replaces);
  * the per-tap lane gathers + phase-weight arithmetic are resample2's,
    minus all validity masks (sv is pre-resolved).

Semantics identical to ops/resample.resample_voices (the jnp reference
path); reproduces do_point/do_lerp/do_cubic/do_bsinc arithmetic
(core/mixer/mixer_c.cpp:48-105) with the same f32 op order.

Host-side eligibility (RenderDevice._rs_plan):
  * the active regions fit a VMEM bucket (shared_layout non-None),
  * every looping voice's loop_len >= the window span
    ((T-1)*inc + 65535 >> 16) + taps (single seam per window),
  * (T-1)*max_inc + 65535 < 2^31 (position math stays in int32),
  * T % 128 == 0 and V % nv == 0.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import MIXER_FRAC_BITS, MIXER_FRAC_MASK, RESAMPLE_TAPS
from .resample2 import pack_meta, winw_for
from .resample_unit import PADMAX

LANE = 128
NV = 4              # voices per grid program
_BIGDIST = (1 << 30)
# Scoped-vmem ceiling requested from Mosaic (v5e: 128 MiB physical); the
# host plan gates on GATE, leaving headroom for stack temporaries the
# vmem_bytes() estimate cannot see (the round-4 OOM was a 16 KiB overrun).
VMEM_LIMIT = 100 * 1024 * 1024
VMEM_GATE = 88 * 1024 * 1024


def plan_statics(T: int, max_inc: int, taps: int):
    """Static kernel geometry for an output window of T samples.

    Returns (wc, gr, kw, msr) — window chunks per output row, rows per
    assembly group, group slice chunks, resolved-image rows per voice.
    """
    wc = winw_for(max_inc, taps) // LANE
    rows = T // LANE
    # Largest group whose slice (group span + window) fits kw <= 128 chunks.
    gr = rows
    while gr > 1:
        kw = (((gr - 1) * LANE * max_inc) >> MIXER_FRAC_BITS) // LANE + wc + 2
        if kw <= 128:
            break
        gr //= 2
    kw = (((gr - 1) * LANE * max_inc) >> MIXER_FRAC_BITS) // LANE + wc + 2
    # Resolved rows: window reach of the last row + group-slice slack (the
    # clamped gb of the last group may sit kw short of the end).
    last = ((65535 + (T - LANE) * max_inc) >> MIXER_FRAC_BITS) // LANE
    msr = max(last + wc + 2, kw + 2)
    return wc, gr, kw, msr


def vmem_bytes(T: int, max_inc: int, taps: int, vrows: int,
               nv: int = NV) -> int:
    """Conservative VMEM footprint of one _resample3 call (host plan check).

    Counts the staged pool image, the per-voice resolved images, the window
    scratch, the weight tables, the double-buffered output block and the
    sliced weight bank; tracks the Mosaic scoped-vmem accounting to ~0.5%
    (calibrated against compile-reported usage), so the host gates plans
    at 15.8 MB of the 16 MB scoped budget."""
    wc, _, _, msr = plan_statics(T, max_inc, taps)
    rows = T // LANE
    wt_lanes = max(((taps * 32 + LANE - 1) // LANE) * LANE, LANE)
    r = (PADMAX + vrows + msr + 1)          # pool image
    r += wc * nv * rows                     # wins
    r += 2 * nv * rows                      # out (double-buffered)
    b = r * LANE * 4
    b += nv * rows * 2 * wt_lanes * 4       # wt
    b += 4 * 52 * taps * LANE * 4           # sliced bank
    return b


def slice_bank(bank_pad: dict, taps: int) -> dict:
    """[52, 48, 128] taps-major bank -> [52, taps, 128] (static lo offset).

    Keeps the kernel's VMEM weight residency at taps rows instead of 48
    (5.1 MB -> 0.4 MB for cubic), freeing budget for the pool image."""
    lo = RESAMPLE_TAPS // 2 - taps // 2
    return {k: v[:, lo:lo + taps, :] for k, v in bank_pad.items()}


def _kernel(meta_sref,                     # [V*16] int32 scalar prefetch
            ch_sref,                       # [2 + 2*(n256+n64)] staging chunks
            meta_ref,                      # [1, 8, 16] VMEM tile (nv used rows)
            fil_ref, phd_ref, scd_ref, spd_ref,   # [52,taps,128] VMEM
            pool_ref,                      # HBM [P/128, 128]
            out_ref,                       # [NV, rows, LANE] VMEM
            pvm_ref, wins_ref, wt_ref, sems,
            *, T: int, taps: int, nv: int, n256: int, n64: int,
            pvm_rows: int, wc: int, gr: int, kw: int, msr: int):
    rows = T // LANE
    center = taps // 2 - 1
    v0 = pl.program_id(0) * nv
    f32 = jnp.float32

    # ---- program 0: stage the pool regions (shared with the unit kernel) --
    def chunk_copy(i, size, base, sem_i):
        return pltpu.make_async_copy(
            pool_ref.at[pl.ds(ch_sref[base + 2 * i], size)],
            pvm_ref.at[pl.ds(ch_sref[base + 2 * i + 1], size)],
            sems.at[sem_i])

    @pl.when(pl.program_id(0) == 0)
    def _():
        c256, c64 = ch_sref[0], ch_sref[1]
        for i in range(n256):
            @pl.when(i < c256)
            def _():
                chunk_copy(i, 256, 2, i).start()
        for i in range(n64):
            @pl.when(i < c64)
            def _():
                chunk_copy(i, 64, 2 + 2 * n256, n256 + i).start()
        for i in range(n256):
            @pl.when(i < c256)
            def _():
                chunk_copy(i, 256, 2, i).wait()
        for i in range(n64):
            @pl.when(i < c64)
            def _():
                chunk_copy(i, 64, 2 + 2 * n256, n256 + i).wait()

    def scalars(v):
        b = (v0 + v) * 16
        return (meta_sref[b + 0], meta_sref[b + 1], meta_sref[b + 2],
                meta_sref[b + 3], meta_sref[b + 4] != 0,
                meta_sref[b + 5] != 0, meta_sref[b + 6], meta_sref[b + 7],
                meta_sref[b + 8])

    # ---- per voice: phase-weight tables (resample2 layout) -----------------
    wt_lanes = wt_ref.shape[1] // 2
    for v in range(nv):
        row = meta_sref[(v0 + v) * 16 + 9]
        sf = (meta_sref[(v0 + v) * 16 + 10].astype(f32)
              * f32(1.0 / (1 << 24)))
        for j in range(taps):
            w0j = fil_ref[row, j, :32] + sf * scd_ref[row, j, :32]
            wdj = phd_ref[row, j, :32] + sf * spd_ref[row, j, :32]
            wt_ref[pl.ds(v * rows, rows), j * 32:(j + 1) * 32] = \
                jnp.broadcast_to(w0j[None, :], (rows, 32))
            wt_ref[pl.ds(v * rows, rows),
                   wt_lanes + j * 32:wt_lanes + (j + 1) * 32] = \
                jnp.broadcast_to(wdj[None, :], (rows, 32))

    # ---- per (voice, group): one-hot MXU window assembly --------------------
    # The merged stream slice is built on the fly from the staged pool
    # image (loop seam + end clamp + pre-start silence as [kw,128]
    # selects) — no per-voice resolved image is ever materialized; the
    # round-4 design staged one through VMEM and its traffic dominated
    # the kernel (0.45 of 0.92 ms/block).  A seam-aware pl.when split
    # that skips the B read for plain groups measured slower (1.20
    # ms/block) — branch duplication costs more than the loads.
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (wc, gr, kw), 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (wc, gr, kw), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (wc, gr, kw), 2)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (kw, LANE), 1)
    mk_iota = (jax.lax.broadcasted_iota(jnp.int32, (kw, LANE), 0) * LANE
               + lane_k)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    n_groups = -(-rows // gr)
    for v in range(nv):
        off, ln, ls, le, hl, hw, p0, f0, inc = scalars(v)
        base = f0 >> MIXER_FRAC_BITS
        ll = jnp.maximum(le - ls, 1)
        b = p0 + (f0 >> MIXER_FRAC_BITS) - center
        b = jnp.where(hl & hw & (b < ls), b + ll, b)
        rb = jnp.where(hl, b, jnp.minimum(b, jnp.maximum(ln - 1, 0)))
        D = jnp.where(hl, le - rb, jnp.int32(_BIGDIST))
        lc = jnp.maximum(ln - 1, 0) - rb
        ext = msr * LANE
        # Last-frame value (non-loop end clamp, voice.cpp:493-505) from
        # one image row.
        aL = off + rb + jnp.clip(lc, 0, ext - 1)
        rL = jnp.clip(aL >> 7, 0, pvm_rows - 1)
        last = jnp.sum(jnp.where(lane1 == (aL & (LANE - 1)),
                                 pvm_ref[pl.ds(rL, 1)], 0.0))

        def img_sl(a):
            f = a & (LANE - 1)
            r0 = jnp.clip((a - f) >> 7, 0, pvm_rows - (kw + 2))
            S = pvm_ref[pl.ds(r0, kw + 1)]
            rolled = pltpu.roll(S, (LANE - f) & (LANE - 1), 1)
            return jnp.where(lane_k < LANE - f, rolled[:kw], rolled[1:])

        for g in range(n_groups):
            g0 = g * gr
            gb = jnp.clip((((f0 + (g0 * LANE) * inc) >> MIXER_FRAC_BITS)
                           - base) >> 7, 0, msr - kw)
            mb = gb * LANE
            m_sl = mb + mk_iota
            A = img_sl(off + rb + mb)
            B = img_sl(off + ls - D + mb)
            sv = jnp.where(hl & (m_sl >= D), B, A)
            sv = jnp.where(~hl & (m_sl > lc), last, sv)
            sv = jnp.where(hl & (m_sl >= D + ll), 0.0, sv)
            rhs = jnp.where((m_sl >= -rb) & (ln > 0), sv, 0.0)
            m0r = (((f0 + ((g0 + r_iota) * LANE) * inc)
                    >> MIXER_FRAC_BITS) - base)
            idx = (m0r >> 7) - gb + c_iota
            oh = (idx == k_iota).astype(f32).reshape(wc * gr, kw)
            # HIGHEST: the default f32 matmul runs fewer bf16 passes and
            # QUANTIZES the gathered samples; with a 0/1 LHS the 3-pass
            # (bf16x3) product of 1.0 reconstructs each f32 exactly.
            wins = jnp.dot(oh, rhs, preferred_element_type=f32,
                           precision=jax.lax.Precision.HIGHEST)
            nrow = min(gr, rows - g0)
            for c in range(wc):
                wins_ref[c, v, g0:g0 + nrow] = \
                    wins[c * gr:c * gr + nrow]

    # ---- batched gather + accumulate (resample2 semantics, mask-free) ------
    R = nv * rows
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    row_in_voice = jax.lax.broadcasted_iota(
        jnp.int32, (nv, rows, LANE), 1).reshape(R, LANE)
    t_idx = row_in_voice * LANE + lane2

    def col(j):
        c = meta_ref[0, :nv, j]
        return jnp.broadcast_to(c[:, None, None],
                                (nv, rows, 1)).reshape(R, 1)

    f0v, incv = col(7), col(8)
    basev = f0v >> MIXER_FRAC_BITS
    tot = f0v + t_idx * incv
    m = (tot >> MIXER_FRAC_BITS) - basev
    fr = tot & MIXER_FRAC_MASK
    pi = fr >> 11
    pf = (fr & 2047).astype(f32) * f32(1.0 / 2048.0)
    mrow = ((f0v + (row_in_voice * LANE) * incv) >> MIXER_FRAC_BITS) - basev
    rel0 = m - ((mrow >> 7) << 7)

    acc = jnp.zeros((R, LANE), f32)
    for j in range(taps):
        rel = rel0 + j
        val = jnp.zeros((R, LANE), f32)
        for c in range(wc):
            gch = jnp.take_along_axis(
                wins_ref[c].reshape(R, LANE), rel & (LANE - 1), axis=1)
            val = jnp.where((rel >> 7) == c, gch, val)
        wi = j * 32 + pi
        cw0 = (j * 32) // LANE
        w0 = jnp.take_along_axis(wt_ref[:, cw0 * LANE:(cw0 + 1) * LANE],
                                 wi & (LANE - 1), axis=1)
        cwd = (wt_lanes + j * 32) // LANE
        wd = jnp.take_along_axis(wt_ref[:, cwd * LANE:(cwd + 1) * LANE],
                                 (wt_lanes + wi) & (LANE - 1), axis=1)
        acc = acc + (w0 + pf * wd) * val

    out_ref[...] = acc.reshape(nv, rows, LANE)


@functools.partial(jax.jit, static_argnames=("T", "taps", "nv", "n256",
                                             "n64", "vrows", "max_inc"))
def _resample3(meta, bank_sl, chunks, pool2d, *, T, taps, vrows, n256, n64,
               max_inc, nv=NV):
    V = meta.shape[0]
    rows = T // LANE
    assert V % nv == 0 and T % LANE == 0
    wc, gr, kw, msr = plan_statics(T, max_inc, taps)
    pvm_rows = PADMAX + vrows + msr + 1
    wt_lanes = max(((taps * 32 + LANE - 1) // LANE) * LANE, LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V // nv,),
        in_specs=[
            pl.BlockSpec((1, 8, 16), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),      # meta tile
            pl.BlockSpec(memory_space=pltpu.VMEM),      # fil
            pl.BlockSpec(memory_space=pltpu.VMEM),      # phd
            pl.BlockSpec(memory_space=pltpu.VMEM),      # scd
            pl.BlockSpec(memory_space=pltpu.VMEM),      # spd
            pl.BlockSpec(memory_space=pl.ANY),          # pool (HBM)
        ],
        out_specs=pl.BlockSpec((nv, rows, LANE), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((pvm_rows, LANE), jnp.float32),
            pltpu.VMEM((wc, nv, rows, LANE), jnp.float32),
            pltpu.VMEM((nv * rows, 2 * wt_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((n256 + n64,)),
        ],
    )
    kernel = functools.partial(_kernel, T=T, taps=taps, nv=nv, n256=n256,
                               n64=n64, pvm_rows=pvm_rows, wc=wc, gr=gr,
                               kw=kw, msr=msr)
    meta3 = jnp.pad(meta.reshape(V // nv, nv, 16),
                    ((0, 0), (0, 8 - nv), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, rows, LANE), jnp.float32),
        # The default 16 MiB scoped-vmem budget is what a multi-kernel
        # pipeline wants; this kernel IS the pipeline stage (one grid, all
        # scratch persistent), so let it use most of the v5e's 128 MiB.
        # Keep in sync with VMEM_LIMIT / the host plan gate (vmem_bytes).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(meta.reshape(-1), chunks, meta3, bank_sl["fil"], bank_sl["phd"],
      bank_sl["scd"], bank_sl["spd"], pool2d)
    return out.reshape(V, T)


def resample_voices_gen_shared(pool2d, off_vmem, src_len, loop_start,
                               loop_end, has_loop, has_wrapped, pos_int,
                               pos_frac, increment, bank_row, sf, bank_sl,
                               chunks, n: int, taps: int, n256: int,
                               n64: int, vrows: int, max_inc: int,
                               active=None, nv: int = NV):
    """Drop-in for ops.resample.resample_voices at any pitch profile.

    ``off_vmem``/``chunks`` come from resample_unit.shared_layout;
    ``bank_sl`` from slice_bank(pad_bank_taps(bank), taps); ``max_inc`` is
    the static increment bucket (host plan).  ``active`` zeroes inactive
    rows' geometry (parked at uninitialized image pad rows) so their
    resolved stream is exact silence — see resample_voices_unit_shared.
    """
    if active is not None:
        src_len = jnp.where(active, src_len, 0)
        has_loop = has_loop & active
        pos_int = jnp.where(active, pos_int, 0)
        pos_frac = jnp.where(active, pos_frac, 0)
        loop_start = jnp.where(active, loop_start, 0)
        loop_end = jnp.where(active, loop_end, 1)
        increment = jnp.where(active, increment, 1 << MIXER_FRAC_BITS)
    meta = pack_meta(off_vmem, src_len, loop_start, loop_end, has_loop,
                     has_wrapped, pos_int, pos_frac, increment, bank_row, sf)
    return _resample3(meta, bank_sl, chunks, pool2d, T=n, taps=taps,
                      vrows=vrows, n256=n256, n64=n64, max_inc=max_inc,
                      nv=nv)
