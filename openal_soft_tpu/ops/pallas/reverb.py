"""Pallas TPU kernel for the EAXReverb pipeline hot loop.

The XLA form of ReverbPipeline (effects/reverb.py _run_pipeline) is a
lax.scan of ~1000 tiny ops per 256-sample chunk — delay-line reads, four
chunk-parallel biquads, fixed-point all-passes — each op a separate device
kernel on [4, 256] data.  Per-op dispatch overhead makes ONE reverb slot
cost ~0.7-1.2 ms per 1024-frame block, dominating the loaded-scene budget
(PROFILE.md round 5).

This kernel runs the whole pipeline for a W-sample window inside ONE
Pallas program: all six delay rings live in VMEM for the duration (about
1.2 MB), the sequential chunk loop is the Pallas grid, and every jnp op
becomes a register-level vector op.  Semantics mirror the jnp path op for
op (reverb.cpp:1397-1599 structure, fixed-point all-pass iteration,
balanced-companion chunked biquads), with the early->late chunk order
interleaved per chunk — exactly equivalent, since the late stage only
reads rings the early stage of the SAME chunk has already written.

Eligibility (host-gated in effects/reverb.py): CH == 256, W % CH == 0,
single active pipeline processing (the A/B crossfade window and the
first-order upmix run each pipeline through this same kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NL = 4                  # NUM_LINES
CH = 256                # pipeline chunk (effects/reverb.py self.chunk @48k)
CROWS = CH // LANE      # 2
_SUB = 32               # biquad subchunk (ops/filters.SAMPLES_PER_STEP)


def _iota_t(shape3):
    """Per-sample index (row*128+lane) over [NL, CROWS, LANE]."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    return row * LANE + lane


def _read_line(ref, line, start, nrows):
    """[nrows, 128] window of ring line ``line`` starting at element
    ``start`` (traced, any alignment; ring rows are pow2)."""
    f = start & (LANE - 1)
    r0 = (start - f) >> 7
    S = ref[line, pl.ds(r0, nrows + 1), :]
    rolled = pltpu.roll(S, (LANE - f) & (LANE - 1), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nrows + 1, LANE), 1)[:nrows]
    return jnp.where(lane < LANE - f, rolled[:nrows], rolled[1:])


def _ring_read(ref, lrows, off, lags, nrows=CROWS):
    """[NL, nrows, 128] window at (off - lag_l) per line; ring len pow2."""
    outs = []
    for l in range(NL):
        start = (off - lags[l]) & (lrows * LANE - 1)
        outs.append(_read_line(ref, l, start, nrows))
    return jnp.stack(outs)


MIRROR = 8   # trailing mirror rows per ring (largest read window + slack)


def _ring_write(ref, lrows, off, val):
    """Aligned CH-wide write at off (multiple of CH) for all lines.

    Rings carry MIRROR trailing rows duplicating rows [0, MIRROR) so reads
    never wrap (same trick as a mirrored ring buffer); writes into the head
    region refresh the mirror."""
    row = ((off & (lrows * LANE - 1)) >> 7)
    for l in range(NL):
        ref[l, pl.ds(row, CROWS), :] = val[l]

    @pl.when(row < MIRROR)
    def _():
        for l in range(NL):
            ref[l, pl.ds(row + lrows, CROWS), :] = val[l]


def _row_roll(x, r):
    """Rotate [CROWS, LANE] down by r rows (r traced in [0, CROWS)).
    Mosaic has no dynamic sublane rotate for unaligned (<8-row) shapes;
    CROWS is tiny, so select among the static rotations."""
    out = x
    for k in range(1, CROWS):
        rk = jnp.concatenate([x[CROWS - k:], x[:CROWS - k]], axis=0)
        out = jnp.where(r == k, rk, out)
    return out


def _shift_right_rows(x, lags):
    """Per-line right-shift by traced scalar lag with zero fill, over
    [NL, CROWS, LANE]; lags is a length-NL list of scalars."""
    t2 = (jax.lax.broadcasted_iota(jnp.int32, (CROWS, LANE), 0) * LANE
          + jax.lax.broadcasted_iota(jnp.int32, (CROWS, LANE), 1))
    lane = jax.lax.broadcasted_iota(jnp.int32, (CROWS, LANE), 1)
    outs = []
    for l in range(NL):
        lag = lags[l]
        f = lag & (LANE - 1)
        r = (lag >> 7) % CROWS
        rolled = _row_roll(pltpu.roll(x[l], f, 1), r)
        # lane-roll + row-roll place sample t at t+lag; lanes that wrapped
        # within a row belong one row later -> fix with one more row-roll.
        fixed = jnp.where(lane < f, _row_roll(rolled, jnp.int32(1)), rolled)
        outs.append(jnp.where(t2 >= lag, fixed, 0.0))
    return jnp.stack(outs)


def _gather_lanes(src3, idx3):
    """Lane-local take_along_axis for [NL, CROWS, LANE] operands (Mosaic
    supports 2-D gathers only)."""
    s2 = src3.reshape(NL * CROWS, LANE)
    i2 = idx3.reshape(NL * CROWS, LANE)
    return jnp.take_along_axis(s2, i2, axis=1).reshape(NL, CROWS, LANE)


def _scatter(x, mix_x, mix_y):
    s0, s1, s2, s3 = x[0], x[1], x[2], x[3]
    return jnp.stack([
        mix_x * s0 + mix_y * (s1 - s2 + s3),
        mix_x * s1 + mix_y * (-s0 + s2 + s3),
        mix_x * s2 + mix_y * (s0 - s1 + s3),
        mix_x * s3 + mix_y * (-s0 - s1 - s2)])


def _biquad_chunked(x, z, cfblk):
    """ops/filters._biquad_chunked_single over one [NL, CROWS, LANE] chunk
    with constant per-line coefficients cfblk [NL, 128] (value; b0 b1 b2
    a1 a2 in lanes 0-4) and TDF2 state z [NL, 2] (value).

    Same balanced-companion state space (s_{t+1} = A s_t + B x_t,
    y_t = s0_t + b0 x_t); the prefix states are produced by a log-depth
    parallel linear-recurrence scan over the lane axis (pltpu.roll +
    iota masks — Mosaic cannot lower the lane-splitting reshape the
    subchunk formulation needs).  Per sample t:
        s_t = A^t z + v_{t-1},  v_m = sum_{j<=m} A^{m-j} B x_j
    with A^t built by a per-sample binary power ladder and v by 7
    doubling rounds within rows plus a sequential cross-row fix.

    Returns (y [NL, CROWS, LANE], z' [NL, 2])."""
    nk = LANE.bit_length() - 1                               # 7
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (NL, LANE), 1)
    b0 = cfblk[:, 0:1]                                       # [NL, 1]
    b1 = cfblk[:, 1:2]
    b2 = cfblk[:, 2:3]
    a1 = cfblk[:, 3:4]
    a2 = cfblk[:, 4:5]
    delta = jnp.sqrt(jnp.maximum(jnp.abs(a2), 1e-8))
    A00, A01 = -a1, delta
    A10 = -a2 / delta
    B0 = b1 - a1 * b0
    B1 = (b2 - a2 * b0) / delta
    s0 = z[:, 0:1]                                           # row-entry state
    s1 = z[:, 1:2] / delta

    # A^(2^k) chain, k = 0..nk ([NL,1] 2x2 entries); pows[nk] = A^LANE.
    pows = [(A00, A01, A10, jnp.zeros_like(A00))]
    for _ in range(nk):
        p00, p01, p10, p11 = pows[-1]
        pows.append((p00 * p00 + p01 * p10, p00 * p01 + p01 * p11,
                     p10 * p00 + p11 * p10, p10 * p01 + p11 * p11))

    # Per-lane A^lane ladder ([NL, LANE] entries; [NL,1] coefficient
    # broadcasts stay lane-only — Mosaic cannot broadcast both dims).
    m00 = jnp.ones((NL, LANE), jnp.float32)
    m11 = jnp.ones((NL, LANE), jnp.float32)
    m01 = jnp.zeros((NL, LANE), jnp.float32)
    m10 = jnp.zeros((NL, LANE), jnp.float32)
    for k in range(nk):
        bit = ((lane_i >> k) & 1) == 1
        q00, q01, q10, q11 = pows[k]
        m00, m01, m10, m11 = (
            jnp.where(bit, q00 * m00 + q01 * m10, m00),
            jnp.where(bit, q00 * m01 + q01 * m11, m01),
            jnp.where(bit, q10 * m00 + q11 * m10, m10),
            jnp.where(bit, q10 * m01 + q11 * m11, m11))

    ys = []
    for r in range(CROWS):
        xr = x[:, r, :]                                      # [NL, LANE]
        # Row-local inclusive scan v_t = sum_{j<=t} A^(t-j) B x_j by
        # doubling rounds over the lane axis.
        v0 = B0 * xr
        v1 = B1 * xr
        for k in range(nk):
            d = 1 << k
            q00, q01, q10, q11 = pows[k]
            r0 = jnp.where(lane_i >= d, pltpu.roll(v0, d, 1), 0.0)
            r1 = jnp.where(lane_i >= d, pltpu.roll(v1, d, 1), 0.0)
            v0 = v0 + q00 * r0 + q01 * r1
            v1 = v1 + q10 * r0 + q11 * r1
        # s_t = A^lane @ s_rowstart + v_{t-1} (exclusive; lane 0 = entry).
        w0 = m00 * s0 + m01 * s1
        vs0 = jnp.where(lane_i == 0, 0.0, pltpu.roll(v0, 1, 1))
        ys.append(w0 + vs0 + b0 * xr)
        # Row-exit state: s' = A^LANE @ s + v_last.
        vl0 = jnp.sum(jnp.where(lane_i == LANE - 1, v0, 0.0),
                      axis=1, keepdims=True)
        vl1 = jnp.sum(jnp.where(lane_i == LANE - 1, v1, 0.0),
                      axis=1, keepdims=True)
        pL00, pL01, pL10, pL11 = pows[nk]
        s0, s1 = (pL00 * s0 + pL01 * s1 + vl0,
                  pL10 * s0 + pL11 * s1 + vl1)

    y = jnp.stack(ys, axis=1)                                # [NL,CROWS,LANE]
    z2 = jnp.concatenate([s0, s1 * delta], axis=1)           # back to TDF2
    return y, z2




def _kernel(sc_i, sc_f,
            ain_ref,
            main_ref, eap_ref, edl_ref, lin_ref, vap_ref, ldl_ref,
            zs_ref, cf_ref, ctab_ref,
            early_ref, late_ref,
            main_o, eap_o, edl_o, lin_o, vap_o, ldl_o, zs_o,
            zsc_ref,
            *, rows: dict, n_chunks: int, mod_win: int,
            e_passes: int, l_passes: int, dbg: str = ""):
    c = pl.program_id(0)
    f32 = jnp.float32

    off = sc_i[0] + c * CH
    do_fade = sc_i[2] != 0
    et0 = [sc_i[3 + l] for l in range(NL)]
    et1 = [sc_i[7 + l] for l in range(NL)]
    lt0 = [sc_i[11 + l] for l in range(NL)]
    lt1 = [sc_i[15 + l] for l in range(NL)]
    e_ap_off = [sc_i[19 + l] for l in range(NL)]
    e_off = [sc_i[23 + l] for l in range(NL)]
    l_ap_off = [sc_i[27 + l] for l in range(NL)]
    l_off = [sc_i[31 + l] for l in range(NL)]
    mod_step = sc_i[35]
    mod_index0 = sc_i[36]

    ec0 = [sc_f[0 + l] for l in range(NL)]
    ec1 = [sc_f[4 + l] for l in range(NL)]
    e_coeff = [sc_f[8 + l] for l in range(NL)]
    t60_mid = [sc_f[12 + l] for l in range(NL)]
    dens_g = [sc_f[16 + l] for l in range(NL)]
    e_ap_coeff = sc_f[20]
    l_ap_coeff = sc_f[21]
    mix_x = sc_f[22]
    mix_y = sc_f[23]
    mod_depth = sc_f[24]

    cfv = cf_ref[...]                      # [16, 128]: 4 filters x 4 lines

    def cf_of(fi):
        return cfv[fi * NL:(fi + 1) * NL]

    fade_now = do_fade & (c == 0)
    t_idx = _iota_t((NL, CROWS, LANE))
    i_ch = t_idx.astype(f32)
    fade_step = f32(1.0 / CH)

    # Ring updates go through the OUTPUT refs: with whole-array VMEM
    # blocks, input and aliased output are separate VMEM windows (the
    # alias is at the HBM level), so in-place updates written to the
    # input window would never reach the output buffers.  Chunk 0
    # seeds the outputs with the carried ring content.
    @pl.when(c == 0)
    def _():
        main_o[...] = main_ref[...]
        eap_o[...] = eap_ref[...]
        edl_o[...] = edl_ref[...]
        lin_o[...] = lin_ref[...]
        vap_o[...] = vap_ref[...]
        ldl_o[...] = ldl_ref[...]
        zsc_ref[...] = zs_ref[...]

    zs = zsc_ref[...]

    ain = ain_ref[0]

    # ---- early: main line write + crossfaded tap reads --------------------
    _ring_write(main_o, rows["main"], off, ain)
    tap0 = [jnp.where(fade_now, et0[l], et1[l]) for l in range(NL)]
    w0 = _ring_read(main_o, rows["main"], off, tap0)
    w1 = _ring_read(main_o, rows["main"], off, et1)
    fadec = fade_step * i_ch
    tmp = jnp.stack([w0[l] * (jnp.where(fade_now, ec0[l], ec1[l])
                              * (1.0 - fadec[l]))
                     + w1[l] * (ec1[l] * fadec[l]) for l in range(NL)])

    dbg_vals = {"taps": tmp}
    # ---- master band filters ---------------------------------------------
    y0, lp_z2 = _biquad_chunked(tmp, zs[0:NL, 0:2], cf_of(0))
    y1, hp_z2 = _biquad_chunked(y0, zs[NL:2 * NL, 0:2], cf_of(1))
    tmp = y1
    dbg_vals["lp"] = y0
    dbg_vals["hp"] = y1

    # ---- early all-pass (Allpass4, fixed-point iteration) -----------------
    win = _ring_read(eap_o, rows["eap"], off, e_ap_off)
    lag_mask = jnp.stack([t_idx[l] < e_ap_off[l] for l in range(NL)])
    d_est = tmp
    for _ in range(e_passes):
        back = _shift_right_rows(d_est, e_ap_off)
        r = jnp.where(lag_mask, win, back)
        y = r - e_ap_coeff * tmp
        d_est = tmp + e_ap_coeff * y
    back = _shift_right_rows(d_est, e_ap_off)
    yap = jnp.where(lag_mask, win, back) - e_ap_coeff * tmp
    _ring_write(eap_o, rows["eap"], off, d_est)
    tmp = yap
    dbg_vals["eapd"] = d_est
    dbg_vals["eap"] = yap

    # ---- reflect into the early delay, combine with delayed echo ----------
    # REFLECT = I - 0.5*ones (DelayLineU::writeReflected): +0.5 on the
    # diagonal, -0.5 off it.
    refl = jnp.stack([
        0.5 * (tmp[0] - tmp[1] - tmp[2] - tmp[3]),
        0.5 * (-tmp[0] + tmp[1] - tmp[2] - tmp[3]),
        0.5 * (-tmp[0] - tmp[1] + tmp[2] - tmp[3]),
        0.5 * (-tmp[0] - tmp[1] - tmp[2] + tmp[3])])
    _ring_write(edl_o, rows["edl"], off, refl)
    ewin = _ring_read(edl_o, rows["edl"], off, e_off)
    backr = _shift_right_rows(refl, e_off)
    emask = jnp.stack([t_idx[l] < e_off[l] for l in range(NL)])
    dread = jnp.where(emask, ewin, backr)
    early_out = jnp.stack([dread[l] * e_coeff[l] + tmp[l]
                           for l in range(NL)])
    dbg_vals["refl"] = refl
    dbg_vals["dread"] = dread

    # ---- scatter into the late input delay --------------------------------
    sc = _scatter(tmp, mix_x, mix_y)
    _ring_write(lin_o, rows["lin"], off, sc)
    dbg_vals["sc"] = sc

    early_ref[0] = early_out

    # ======================= late ==========================================
    # Modulation index math in int32 (two's-complement wrap == the uint32
    # arithmetic of the jnp path; Mosaic has no uint32->f32 cast).  The
    # masked low 24 bits are always non-negative in int32.
    MODF = 1 << 24
    iidx = (mod_index0 + (c * CH) * mod_step + t_idx * mod_step)
    xm = (iidx & (MODF - 1)).astype(f32) * f32(1.0 / MODF)
    half = (iidx & (MODF >> 1)) == 0
    lfo = jnp.where(half, (-16.0 * xm * xm) + (8.0 * xm),
                    (16.0 * xm * xm) - (24.0 * xm) + 8.0)
    idelay = ((lfo + 1.0) * (mod_depth * 256.0)).astype(jnp.int32)

    wrows = (CH + mod_win + LANE - 1) // LANE + 1
    base_lag = [l_off[l] + mod_win for l in range(NL)]
    lwin = _ring_read(ldl_o, rows["ldl"], off, base_lag, nrows=wrows)
    ip = idelay >> 8
    frac = idelay & 255
    pos0 = t_idx - ip + mod_win
    acc = jnp.zeros((NL, CROWS, LANE), f32)
    for tap in range(4):
        p = jnp.clip(pos0 - tap, 0, wrows * LANE - 1)
        val = jnp.zeros((NL, CROWS, LANE), f32)
        for r in range(wrows):
            g = _gather_lanes(
                jnp.broadcast_to(lwin[:, r:r + 1, :], (NL, CROWS, LANE)),
                p & (LANE - 1))
            val = jnp.where((p >> 7) == r, g, val)
        # cubic_tab[frac, tap]: ctab rows = tap*2 + (frac>>7), lanes frac&127
        ctv = jnp.zeros((NL, CROWS, LANE), f32)
        for h in range(2):
            ct = _gather_lanes(
                jnp.broadcast_to(ctab_ref[tap * 2 + h][None, None, :],
                                 (NL, CROWS, LANE)),
                frac & (LANE - 1))
            ctv = jnp.where((frac >> 7) == h, ct, ctv)
        acc = acc + val * ctv
    tmp = jnp.stack([acc[l] * t60_mid[l] for l in range(NL)])
    dbg_vals["mod"] = tmp

    # ---- T60 damping (HF then LF shelf) -----------------------------------
    yh, t60hf_z2 = _biquad_chunked(tmp, zs[2 * NL:3 * NL, 0:2], cf_of(2))
    yl, t60lf_z2 = _biquad_chunked(yh, zs[3 * NL:4 * NL, 0:2], cf_of(3))
    tmp = yl
    dbg_vals["t60"] = yl

    # ---- input taps from the late-input delay with density-gain fade ------
    ltap0 = [jnp.where(fade_now, lt0[l], lt1[l]) for l in range(NL)]
    lw0 = _ring_read(lin_o, rows["lin"], off, ltap0)
    lw1 = _ring_read(lin_o, rows["lin"], off, lt1)
    parts = []
    for l in range(NL):
        step = jnp.where(ltap0[l] != lt1[l], dens_g[l] * fade_step, 0.0)
        fade0 = dens_g[l] - step * i_ch[l]
        fade1 = step * i_ch[l]
        parts.append(tmp[l] + lw0[l] * fade0 + lw1[l] * fade1)
    tmp = jnp.stack(parts)
    dbg_vals["lin"] = tmp

    # ---- vector all-pass (VecAllpass, fixed-point iteration) --------------
    vwin = _ring_read(vap_o, rows["vap"], off, l_ap_off)
    vmask = jnp.stack([t_idx[l] < l_ap_off[l] for l in range(NL)])
    d_est = tmp
    for _ in range(l_passes):
        back = _shift_right_rows(d_est, l_ap_off)
        r = jnp.where(vmask, vwin, back)
        y = r - l_ap_coeff * tmp
        d_est = _scatter(tmp + l_ap_coeff * y, mix_x, mix_y)
    back = _shift_right_rows(d_est, l_ap_off)
    out = jnp.where(vmask, vwin, back) - l_ap_coeff * tmp
    _ring_write(vap_o, rows["vap"], off, d_est)

    # ---- reverse, scatter, refeed the late delay --------------------------
    # (Pallas TPU cannot lower the `rev` primitive; NL is static, so the
    # line-axis reversal is a restack.)
    rev = _scatter(jnp.stack([out[NL - 1 - l] for l in range(NL)]),
                   mix_x, mix_y)
    _ring_write(ldl_o, rows["ldl"], off, rev)

    dbg_vals["vapd"] = d_est
    dbg_vals["rev"] = rev
    late_ref[0] = out
    if dbg:
        early_ref[...] = dbg_vals[dbg][None]

    # carried filter states -> scratch; final chunk stores them out
    znew = jnp.concatenate([lp_z2, hp_z2, t60hf_z2, t60lf_z2], axis=0)
    zsc_ref[:, 0:2] = znew

    @pl.when(c == n_chunks - 1)
    def _():
        zs_o[...] = zsc_ref[...]


@functools.partial(
    jax.jit, static_argnames=("n_chunks", "mod_win", "e_passes", "l_passes",
                              "rows_t", "dbg"))
def _reverb_pipeline(sc_i, sc_f, ain4, main, eap, edl, lin, vap, ldl, zs,
                     cf, ctab, *, n_chunks, mod_win, e_passes, l_passes,
                     rows_t, dbg=""):
    rows = dict(rows_t)
    specs_ring = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, NL, CROWS, LANE), lambda c, *_: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # ain
            *specs_ring,
            pl.BlockSpec(memory_space=pltpu.VMEM),        # zs [16,128]
            pl.BlockSpec(memory_space=pltpu.VMEM),        # cf [16,128]
            pl.BlockSpec(memory_space=pltpu.VMEM),        # ctab [8,128]
        ],
        out_specs=[
            pl.BlockSpec((1, NL, CROWS, LANE), lambda c, *_: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # early
            pl.BlockSpec((1, NL, CROWS, LANE), lambda c, *_: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # late
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
            pl.BlockSpec(memory_space=pltpu.VMEM),        # zs out
        ],
        scratch_shapes=[pltpu.VMEM((16, LANE), jnp.float32)],
    )
    kernel = functools.partial(_kernel, rows=rows, n_chunks=n_chunks,
                               mod_win=mod_win, e_passes=e_passes,
                               l_passes=l_passes, dbg=dbg)
    out_shapes = [
        jax.ShapeDtypeStruct((n_chunks, NL, CROWS, LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_chunks, NL, CROWS, LANE), jnp.float32),
        jax.ShapeDtypeStruct(main.shape, jnp.float32),
        jax.ShapeDtypeStruct(eap.shape, jnp.float32),
        jax.ShapeDtypeStruct(edl.shape, jnp.float32),
        jax.ShapeDtypeStruct(lin.shape, jnp.float32),
        jax.ShapeDtypeStruct(vap.shape, jnp.float32),
        jax.ShapeDtypeStruct(ldl.shape, jnp.float32),
        jax.ShapeDtypeStruct((16, LANE), jnp.float32),
    ]
    # Ring + state inputs alias their outputs (in-place update).  Alias
    # indices count the flattened inputs including the two scalar-prefetch
    # operands: sc_i=0, sc_f=1, ain=2, rings 3..8, zs=9, cf=10, ctab=11;
    # outputs: early=0, late=1, rings 2..7, zs=8.
    aliases = {3: 2, 4: 3, 5: 4, 6: 5, 7: 6, 8: 7, 9: 8}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(sc_i, sc_f, ain4, main, eap, edl, lin, vap, ldl, zs, cf, ctab)


def run_pipeline_pallas(ain, st: dict, params_i, params_f, cf, ctab,
                        offset0, mod_index0, do_fade, W: int, mod_win: int,
                        e_passes: int, l_passes: int, dbg: str = ""):
    """Drive the kernel over a W-sample window.

    ain: [NL, W] wet input (already B2A-converted).
    st: ring + filter state dict (jnp arrays, shapes per effects/reverb.py):
        main/early_ap/early_dl/late_in/vecap/late_dl [NL, L*], lp_z/hp_z/
        t60_hf_z/t60_lf_z [NL, 2].
    params_i/params_f: packed per-pipeline scalars (see pack_params).
    Returns (early [NL, W], late [NL, W], new_st).
    """
    n_chunks = W // CH
    rings = {}
    shapes = {}
    for k, key in (("main", "main"), ("eap", "early_ap"), ("edl", "early_dl"),
                   ("lin", "late_in"), ("vap", "vecap"), ("ldl", "late_dl")):
        buf = st[key]
        shapes[k] = buf.shape
        r3 = buf.reshape(NL, buf.shape[1] // LANE, LANE)
        # Extend with the mirror rows (reads never wrap in-kernel).
        rings[k] = jnp.concatenate([r3, r3[:, :MIRROR]], axis=1)
    rows_t = tuple(sorted(
        (k, rings[k].shape[1] - MIRROR)
        for k in ("main", "eap", "edl", "lin", "vap", "ldl")))
    zs = jnp.zeros((16, LANE), jnp.float32)
    zs = zs.at[0:NL, 0:2].set(st["lp_z"])
    zs = zs.at[NL:2 * NL, 0:2].set(st["hp_z"])
    zs = zs.at[2 * NL:3 * NL, 0:2].set(st["t60_hf_z"])
    zs = zs.at[3 * NL:4 * NL, 0:2].set(st["t60_lf_z"])
    sc_i = jnp.concatenate([
        jnp.asarray(offset0).astype(jnp.int32).reshape(1),
        jnp.zeros(1, jnp.int32),
        jnp.asarray(do_fade).astype(jnp.int32).reshape(1),
        params_i.astype(jnp.int32),
        jnp.asarray(mod_index0).astype(jnp.int32).reshape(1),
    ])
    ain4 = ain.reshape(NL, W // LANE, LANE).reshape(
        NL, n_chunks, CROWS, LANE).swapaxes(0, 1)
    early, late, m2, a2, d2, i2, v2, l2, zs2 = _reverb_pipeline(
        sc_i, params_f, ain4, rings["main"], rings["eap"], rings["edl"],
        rings["lin"], rings["vap"], rings["ldl"], zs, cf, ctab,
        n_chunks=n_chunks, mod_win=mod_win, e_passes=e_passes,
        l_passes=l_passes, rows_t=rows_t, dbg=dbg)
    new_st = dict(st)
    for k, key, arr in (("main", "main", m2), ("eap", "early_ap", a2),
                        ("edl", "early_dl", d2), ("lin", "late_in", i2),
                        ("vap", "vecap", v2), ("ldl", "late_dl", l2)):
        new_st[key] = arr[:, :-MIRROR].reshape(shapes[k])
    new_st["lp_z"] = zs2[0:NL, 0:2]
    new_st["hp_z"] = zs2[NL:2 * NL, 0:2]
    new_st["t60_hf_z"] = zs2[2 * NL:3 * NL, 0:2]
    new_st["t60_lf_z"] = zs2[3 * NL:4 * NL, 0:2]
    early = early.swapaxes(0, 1).reshape(NL, W)
    late = late.swapaxes(0, 1).reshape(NL, W)
    return early, late, new_st
