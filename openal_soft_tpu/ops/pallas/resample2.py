"""Batched-voice Pallas TPU resampler (v2).

Replaces the v1 kernel (ops/pallas/resample.py: one voice per grid program,
full-span chunk scans per tap) with the production design:

  * NV voices per grid program; every vector op covers all NV*rows output
    rows at once as [NV*rows, 128] tiles.
  * Per-row source windows: output positions are affine in the sample index,
    so each 128-output row touches a window of at most
    (127*increment >> 16) + taps source samples.  Each row loads a few
    128-aligned chunks around its own base instead of scanning every chunk
    of the whole span per tap (the v1 cost model).
  * Loop wrap as a per-row seam: within a row the resolved source index is
    piecewise contiguous with at most one seam (guaranteed by requiring
    loop_len >= window width, checked host-side).  The row window is
    [sliceA | sliceB]: sliceA starts at the row's resolved base (same wrap
    image as the block base -> W1 span, later image -> W2 span anchored at
    loop_start), sliceB continues at loop_start; a per-element index picks
    the piece.
  * Phase weights for all taps live in one [taps*32]-lane table per row, so
    each tap's weight lookup is a single lane-local gather.

Semantics identical to ops/resample.resample_voices (the jnp reference
path); reproduces do_point/do_lerp/do_cubic/do_bsinc arithmetic
(core/mixer/mixer_c.cpp:48-105) with the same f32 op order.

Host-side fallback conditions (use the jnp path):
  * a looping voice with loop_len < window width (seam could repeat),
  * T not a multiple of 128, or V not a multiple of NV.
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
NV = 8              # voices per grid program
_BIGDIST = (1 << 30)

# Window-span buckets (source samples per block dispatch), multiples of 1024
# for HBM DMA slice alignment; sized for T=1024 at ~1x/2x/4x/10x pitch.
SPAN_BUCKETS = (2048, 3072, 5120, 11264)


def span_for_increment(max_increment: int, T: int = 1024,
                       winw: int = 384) -> int:
    # Must cover the last row's window: base advance + full window width
    # (the extra 1024 of DMA slop absorbs the alignment remainder).
    need = (((T - LANE) * max_increment) >> MIXER_FRAC_BITS) + winw + 1
    for s in SPAN_BUCKETS:
        if need <= s:
            return s
    return SPAN_BUCKETS[-1]


def winw_for(max_increment: int, taps: int) -> int:
    """Smallest supported per-row window width covering 128 outputs.

    The window is loaded at 128-chunk granularity with up to 127 lanes of
    alignment slop, hence the extra LANE.
    """
    need = ((127 * max_increment + 0xFFFF) >> MIXER_FRAC_BITS) + taps + 1
    for w in (256, 384, 512, 640, 768, 1152, 1408):
        if need + LANE <= w:
            return w
    raise ValueError(f"increment {max_increment} too large")


def pack_meta(src_off, src_len, loop_start, loop_end, has_loop, has_wrapped,
              pos_int, pos_frac, increment, bank_row, sf):
    """[V, 16] int32 metadata table (columns at static positions).

    The scalar-prefetch copy is passed flattened ([V*16]) because SMEM
    operands must be 1-D."""
    z = jnp.zeros_like(src_off)
    sf_bits = jnp.round(sf.astype(jnp.float32) * (1 << 24)).astype(jnp.int32)
    cols = [src_off, src_len, loop_start, loop_end,
            has_loop.astype(jnp.int32), has_wrapped.astype(jnp.int32),
            pos_int, pos_frac, increment, bank_row, sf_bits,
            z, z, z, z, z]
    return jnp.stack([c.astype(jnp.int32) for c in cols], axis=1)


def _kernel(meta_sref,                     # scalar prefetch [V,16] (SMEM)
            meta_ref,                      # [NV,16] VMEM tile
            fil_ref, phd_ref, scd_ref, spd_ref,   # [52,48,128] VMEM
            pool_ref,                      # HBM [P/128, 128]
            out_ref,                       # [NV, rows, LANE] VMEM
            span_ref, wins_ref, wt_ref, sems,
            *, T: int, taps: int, span: int, pool_len: int, nv: int,
            winw: int, skip=()):
    rows = T // LANE
    R = nv * rows
    center = taps // 2 - 1
    fetch = span + 1024
    fchunks = fetch // LANE
    wchunks = winw // LANE
    v0 = pl.program_id(0) * nv

    # ---- scalar phase: per-voice span DMAs --------------------------------
    def voice_scalars(v):
        b = (v0 + v) * 16
        off = meta_sref[b + 0]
        ln = meta_sref[b + 1]
        ls = meta_sref[b + 2]
        le = meta_sref[b + 3]
        hl = meta_sref[b + 4] != 0
        hw = meta_sref[b + 5] != 0
        p0 = meta_sref[b + 6]
        f0 = meta_sref[b + 7]
        return off, ln, ls, le, hl, hw, p0, f0

    n_unroll = span // (winw - LANE) + 2

    def resolve(x, ls, le, ll, hl, hw, ln):
        # Returns the resolved stream base, possibly negative (leading
        # silence); window anchors clamp to 0 and the gather index shifts.
        for _ in range(n_unroll):
            x = jnp.where(hl & (x >= le), x - ll, x)
        x = jnp.where(hl & hw & (x < ls), x + ll, x)
        return jnp.where(hl, x, jnp.minimum(x, jnp.maximum(ln - 1, 0)))

    dmas = []
    for v in range(nv) if "dma" not in skip else []:
        off, ln, ls, le, hl, hw, p0, f0 = voice_scalars(v)
        ll = jnp.maximum(le - ls, 1)
        base = p0 + (f0 >> MIXER_FRAC_BITS) - center
        base_res = resolve(base, ls, le, ll, hl, hw, ln)
        w1_abs = jnp.clip(off + jnp.maximum(base_res, 0), 0, pool_len - fetch)
        w1_row = pl.multiple_of((w1_abs >> 10) << 3, 8)   # /128, 8-aligned
        d1 = pltpu.make_async_copy(pool_ref.at[pl.ds(w1_row, fchunks)],
                                   span_ref.at[v, 0], sems.at[v, 0])
        d1.start()
        w2_abs = jnp.clip(off + ls, 0, pool_len - fetch)
        w2_row = pl.multiple_of((w2_abs >> 10) << 3, 8)
        d2 = pltpu.make_async_copy(pool_ref.at[pl.ds(w2_row, fchunks)],
                                   span_ref.at[v, 1], sems.at[v, 1])
        d2.start()
        dmas.append((d1, d2))

    # ---- vector phase: per-row metadata ----------------------------------
    def col(j):
        c = meta_ref[:, j]                                   # [nv]
        return jnp.broadcast_to(c[:, None, None],
                                (nv, rows, 1)).reshape(R, 1)

    offv, lnv = col(0), col(1)
    lsv, lev = col(2), col(3)
    hlv = col(4) != 0
    hwv = col(5) != 0
    p0v, f0v = col(6), col(7)
    incv = col(8)
    llv = jnp.maximum(lev - lsv, 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    # Within-voice row index as a 3-D iota (NOT gr & (rows-1): rows is 9 for
    # UHJ-padded blocks, and masking only works for power-of-two row counts).
    row_in_voice = jax.lax.broadcasted_iota(
        jnp.int32, (nv, rows, LANE), 1).reshape(R, LANE)
    t_idx = row_in_voice * LANE + lane                             # [R, LANE]

    tot = f0v + t_idx * incv
    p = p0v + (tot >> MIXER_FRAC_BITS)
    fr = tot & MIXER_FRAC_MASK
    pi = fr >> 11
    pf = (fr & 2047).astype(jnp.float32) * jnp.float32(1.0 / 2048.0)

    def resolve_vec(x):
        for _ in range(n_unroll):
            x = jnp.where(hlv & (x >= lev), x - llv, x)
        x = jnp.where(hlv & hwv & (x < lsv), x + llv, x)
        return jnp.where(hlv, x, jnp.minimum(x, jnp.maximum(lnv - 1, 0)))

    rb = p[:, 0:1] - center                                   # [R, 1]
    rb_res = resolve_vec(rb)
    vb = p0v + (f0v >> MIXER_FRAC_BITS) - center              # voice base
    base_res = resolve_vec(vb)

    # Alignment slop, recomputed with the same arithmetic as the DMAs.
    anchor = jnp.maximum(rb_res, 0)
    shift = rb_res - anchor                                   # <= 0
    w1_abs = jnp.clip(offv + jnp.maximum(base_res, 0), 0, pool_len - fetch)
    extra1 = w1_abs - ((w1_abs >> 10) << 10)
    w2_abs = jnp.clip(offv + lsv, 0, pool_len - fetch)
    extra2 = w2_abs - ((w2_abs >> 10) << 10)

    use_w2 = hlv & ((rb_res - base_res) != (rb - vb))
    a_off = jnp.where(use_w2, anchor - lsv + extra2,
                      anchor - jnp.maximum(base_res, 0) + extra1)
    a_off = jnp.clip(a_off, 0, fetch - winw)
    a_frac = a_off & (LANE - 1)                               # [R, 1]
    b_off = jnp.clip(extra2, 0, fetch - winw)
    b_frac = b_off & (LANE - 1)

    # ---- build per-row windows (aligned chunk loads) -----------------------
    for d1, d2 in dmas:
        d1.wait()
        d2.wait()

    for v in range(nv) if "wins" not in skip else []:
        off, ln, ls, le, hl, hw, p0, f0 = voice_scalars(v)
        ll = jnp.maximum(le - ls, 1)
        inc = meta_sref[(v0 + v) * 16 + 8]
        base = p0 + (f0 >> MIXER_FRAC_BITS) - center
        base_res_s = resolve(base, ls, le, ll, hl, hw, ln)
        w1a = jnp.clip(off + jnp.maximum(base_res_s, 0), 0, pool_len - fetch)
        e1 = w1a - ((w1a >> 10) << 10)
        w2a = jnp.clip(off + ls, 0, pool_len - fetch)
        e2 = w2a - ((w2a >> 10) << 10)
        # sliceB: loop_start image, shared by all rows of the voice.
        b0 = jnp.clip(e2, 0, fetch - winw) >> 7
        for c in range(wchunks):
            wins_ref[pl.ds(v * rows, rows), winw + c * LANE:winw + (c + 1) * LANE] = \
                jnp.broadcast_to(span_ref[v, 1, b0 + c, :][None, :], (rows, LANE))
        for r in range(rows):
            rbs = p0 + ((f0 + (r * LANE) * inc) >> MIXER_FRAC_BITS) - center
            rbr = resolve(rbs, ls, le, ll, hl, hw, ln)
            uw2 = hl & ((rbr - base_res_s) != (rbs - base))
            anch = jnp.maximum(rbr, 0)
            aoff = jnp.where(uw2, anch - ls + e2,
                             anch - jnp.maximum(base_res_s, 0) + e1)
            aoff = jnp.clip(aoff, 0, fetch - winw)
            a0 = aoff >> 7
            sel = jnp.where(uw2, 1, 0)
            for c in range(wchunks):
                wins_ref[v * rows + r, c * LANE:(c + 1) * LANE] = \
                    span_ref[v, sel, a0 + c, :]

    # ---- weight tables -----------------------------------------------------
    lo = RESAMPLE_TAPS // 2 - taps // 2
    wt_lanes = wt_ref.shape[1] // 2
    for v in range(nv) if "wt" not in skip else []:
        row = meta_sref[(v0 + v) * 16 + 9]
        sf = meta_sref[(v0 + v) * 16 + 10].astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
        for j in range(taps):
            w0j = (fil_ref[row, lo + j, :32] + sf * scd_ref[row, lo + j, :32])
            wdj = (phd_ref[row, lo + j, :32] + sf * spd_ref[row, lo + j, :32])
            wt_ref[pl.ds(v * rows, rows), j * 32:(j + 1) * 32] = \
                jnp.broadcast_to(w0j[None, :], (rows, 32))
            wt_ref[pl.ds(v * rows, rows),
                   wt_lanes + j * 32:wt_lanes + (j + 1) * 32] = \
                jnp.broadcast_to(wdj[None, :], (rows, 32))

    # ---- gather + accumulate ----------------------------------------------
    D = lev - rb_res                                          # seam distance
    lenclamp = jnp.where(hlv, _BIGDIST, jnp.maximum(lnv - 1, 0) - rb_res)
    acc = jnp.zeros((R, LANE), jnp.float32)
    n_chunks = 2 * winw // LANE
    for j in range(taps):
        s = p + (j - center)
        d = s - rb
        in_seam = hlv & (d >= D)
        rel = jnp.where(in_seam, winw + (d - D) + b_frac,
                        jnp.minimum(d, lenclamp) + shift + a_frac)
        valid = (s >= 0) & (lnv > 0)
        val = jnp.zeros((R, LANE), jnp.float32)
        for c in range(n_chunks) if "gather" not in skip else [0]:
            g = jnp.take_along_axis(wins_ref[:, c * LANE:(c + 1) * LANE],
                                    rel & (LANE - 1), axis=1)
            val = jnp.where((rel >> 7) == c, g, val)
        val = jnp.where(valid, val, 0.0)

        wi = j * 32 + pi
        cw0 = (j * 32) // LANE           # static chunk holding this tap's w0
        w0 = jnp.take_along_axis(wt_ref[:, cw0 * LANE:(cw0 + 1) * LANE],
                                 wi & (LANE - 1), axis=1)
        cwd = (wt_lanes + j * 32) // LANE
        wd = jnp.take_along_axis(wt_ref[:, cwd * LANE:(cwd + 1) * LANE],
                                 (wt_lanes + wi) & (LANE - 1), axis=1)
        acc = acc + (w0 + pf * wd) * val

    out_ref[...] = acc.reshape(nv, rows, LANE)


@functools.partial(jax.jit,
                   static_argnames=("T", "taps", "span", "winw", "pool_len",
                                    "skip", "nv"))
def _resample2(meta, bank_pad, pool2d, *, T, taps, span, winw, pool_len,
               skip=(), nv=NV):
    V = meta.shape[0]
    rows = T // LANE
    assert V % nv == 0 and T % LANE == 0
    wt_lanes = max(((taps * 32 + LANE - 1) // LANE) * LANE, LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(V // nv,),
        in_specs=[
            pl.BlockSpec((nv, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),      # meta tile
            pl.BlockSpec(memory_space=pltpu.VMEM),      # fil
            pl.BlockSpec(memory_space=pltpu.VMEM),      # phd
            pl.BlockSpec(memory_space=pltpu.VMEM),      # scd
            pl.BlockSpec(memory_space=pltpu.VMEM),      # spd
            pl.BlockSpec(memory_space=pltpu.ANY),       # pool (HBM)
        ],
        out_specs=pl.BlockSpec((nv, rows, LANE), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nv, 2, (span + 1024) // LANE, LANE), jnp.float32),
            pltpu.VMEM((nv * rows, 2 * winw), jnp.float32),
            pltpu.VMEM((nv * rows, 2 * wt_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((nv, 2)),
        ],
    )
    kernel = functools.partial(_kernel, T=T, taps=taps, span=span,
                               pool_len=pool_len, nv=nv, winw=winw,
                               skip=skip)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, rows, LANE), jnp.float32),
    )(meta.reshape(-1), meta, bank_pad["fil"], bank_pad["phd"],
      bank_pad["scd"], bank_pad["spd"], pool2d)
    return out.reshape(V, T)


def pad_bank_taps(bank: dict) -> dict:
    """[52, 32, 48] -> taps-major [52, 48, 128] with 32 phases in lanes."""
    out = {}
    for k, v in bank.items():
        v = np.asarray(v)
        vt = np.transpose(v, (0, 2, 1))                    # [52, 48, 32]
        out[k] = jnp.asarray(np.pad(vt, ((0, 0), (0, 0), (0, LANE - 32))))
    return out


def pool_2d(pool: jax.Array) -> jax.Array:
    """Pool as [P/128, 128] (pad to a 1024-sample multiple first)."""
    P = pool.shape[0]
    pad = (-P) % 1024
    if pad:
        pool = jnp.pad(pool, (0, pad))
    return pool.reshape(-1, LANE)


def resample_voices_pallas2(pool, src_off, src_len, loop_start, loop_end,
                            has_loop, has_wrapped, pos_int, pos_frac,
                            increment, bank_row, sf, bank_pad, n: int,
                            taps: int, span: int, winw: int, skip=(),
                            nv: int = NV):
    """Drop-in for ops.resample.resample_voices on TPU.

    ``pool`` must already be in [P/128, 128] layout (see pool_2d).
    Requires n % 128 == 0, V % NV == 0, and loop_len >= winw for looping
    voices (host-checked).
    """
    meta = pack_meta(src_off, src_len, loop_start, loop_end, has_loop,
                     has_wrapped, pos_int, pos_frac, increment, bank_row, sf)
    return _resample2(meta, bank_pad, pool, T=n, taps=taps, span=span,
                      winw=winw, pool_len=pool.shape[0] * LANE, skip=skip,
                      nv=nv)
