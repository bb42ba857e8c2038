"""Unit-increment Pallas resampler: gather-free contiguous-window FIR.

When a voice's 16.16 increment is exactly 1<<16 (native-rate playback — the
dominant case in real scenes: the reference plays un-pitched sources
through the same resampler, core/mixer/mixer_c.cpp), the resample collapses:

    pos[t]   = pos_int + t          (contiguous)
    frac[t]  = pos_frac             (constant -> constant phase weights)
    out[t]   = sum_j w_j * src[pos_int + t + j - center]

i.e. a 4..48-tap FIR with per-voice constant weights sliding over a
contiguous source window.  The general kernel (resample2.py) pays per-row
window assembly and per-tap lane gathers for arbitrary pitch; none of that
is needed here:

  * ONE aligned HBM->VMEM DMA per voice image (window + slop; the loop
    image is DMA'd only when the seam falls inside this block),
  * one dynamic lane-roll + two-row merge aligns the window to the voice's
    stream (per voice, not per row),
  * each tap is a STATIC lane-roll + row-roll select of the aligned window,
  * loop seams / end clamps / leading silence are iota-vs-scalar masks,
    reproducing ops/resample.resolve_source_index semantics exactly.

Host eligibility (see RenderDevice._rs_plan): every active voice has
increment == 1<<16 and, if looping, loop_len >= T + taps so at most one
seam falls inside the block window.  Weights are precomputed graph-side
([V, taps], the same `(fil + sf*scd) + pf*(phd + sf*spd)` arithmetic as
do_bsinc/do_cubic) since the phase is constant per voice; they ride the
scalar-prefetch channel into SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import MIXER_FRAC_BITS, RESAMPLE_TAPS

LANE = 128
NV = 16             # voices per grid program
_PHASE_SHIFT = MIXER_FRAC_BITS - 5
_PHASE_SUB_MASK = (1 << _PHASE_SHIFT) - 1
_PHASE_SUB_SCALE = 1.0 / (1 << _PHASE_SHIFT)

# Shared-pool variant (resample_voices_unit_shared): the union of the active
# buffers' pool regions is DMA'd into ONE persistent VMEM image by grid
# program 0 and every voice slices its window from VMEM — zero per-voice
# DMAs.  PADMAX leading pad rows make pre-start / pre-seam window slices
# in-bounds for any supported window (max super-block 16 blocks + UHJ pad:
# K+1 <= 132); region addresses baked into the per-voice offsets by the
# host layout are therefore window-size independent.
PADMAX = 132
VROWS_BUCKETS = (2048, 4096, 9216, 18944)   # region-area VMEM rows (f32)
CHUNK_ALIGN = 64                            # region sizes round to this
_CNT_ALIGN = 16                             # DMA-count bucket granularity


def unit_weights_np(bank, bank_row, sf, pos_frac, taps: int):
    """Constant per-voice tap weights [V, taps] (phase fixed at pos_frac).

    Host numpy, f32 — same `(fil + sf*scd) + pf*(phd + sf*spd)` op order as
    do_bsinc/do_cubic (mixer_c.cpp:83-105) and the jnp voice_weights path.
    Valid because pos_frac is invariant at unit increment: it changes only
    on host position writes, which already rebuild the device config.
    """
    import numpy as np

    lo = RESAMPLE_TAPS // 2 - taps // 2
    pi = pos_frac >> _PHASE_SHIFT
    pf = ((pos_frac & _PHASE_SUB_MASK).astype(np.float32)
          * np.float32(_PHASE_SUB_SCALE))
    sel = lambda k: np.asarray(bank[k])[bank_row, pi, lo:lo + taps]
    sfc = sf.astype(np.float32)[:, None]
    w0 = sel("fil") + sfc * sel("scd")
    wd = sel("phd") + sfc * sel("spd")
    return (w0 + pf[:, None] * wd).astype(np.float32)


def _kernel(meta_sref,                      # [V*8] int32 scalar prefetch
            w_sref,                         # [V*taps] f32 scalar prefetch
            pool_ref,                       # HBM [P/128, 128]
            out_ref,                        # [NV, rows, LANE] VMEM
            span_ref, sw_ref, sems,
            *, T: int, taps: int, pool_rows: int, nv: int, fchunks: int):
    rows = T // LANE
    center = taps // 2 - 1
    K = rows + 1                            # window rows incl. tap overhang
    PADR = K + 1                            # leading span pad rows (see below)
    v0 = pl.program_id(0) * nv

    def scalars(v):
        b = (v0 + v) * 8
        return (meta_sref[b + 0], meta_sref[b + 1], meta_sref[b + 2],
                meta_sref[b + 3], meta_sref[b + 4] != 0,
                meta_sref[b + 5] != 0, meta_sref[b + 6])

    def voice_geometry(v):
        off, ln, ls, le, hl, hw, p0 = scalars(v)
        ll = jnp.maximum(le - ls, 1)
        # Positions were rebased into [ls, le) at the previous block end, so
        # only a single backward wrap (history below ls) can remain
        # (resolve_source_index semantics).
        b = p0 - center
        b = jnp.where(hl & hw & (b < ls), b + ll, b)
        rb = jnp.where(hl, b, jnp.minimum(b, jnp.maximum(ln - 1, 0)))
        row1 = jnp.clip((off + jnp.maximum(rb, 0)) >> 7, 0,
                        pool_rows - fchunks)
        q1 = off + rb - (row1 << 7)
        D = jnp.where(hl, le - rb, jnp.int32(1 << 30))     # seam distance
        row2 = jnp.clip((off + ls) >> 7, 0, pool_rows - fchunks)
        q2 = off + ls - D - (row2 << 7)
        need2 = hl & (D < T + taps)
        return rb, row1, q1, D, row2, q2, need2, ln, hl

    # ---- scalar phase: per-voice span DMAs --------------------------------
    # Unrolled per-voice loops: Mosaic pipelines the independent voices'
    # scalar and vector work across iterations (a fori_loop form compiled
    # ~2x faster but ran ~50% slower).
    def dmas(v, g):
        _, row1, _, _, row2, _, need2, _, _ = g
        d1 = pltpu.make_async_copy(pool_ref.at[pl.ds(row1, fchunks)],
                                   span_ref.at[v, 0, pl.ds(PADR, fchunks)],
                                   sems.at[v, 0])
        d2 = pltpu.make_async_copy(pool_ref.at[pl.ds(row2, fchunks)],
                                   span_ref.at[v, 1, pl.ds(PADR, fchunks)],
                                   sems.at[v, 1])
        return d1, d2, need2

    def start_body(v, carry):
        d1, d2, need2 = dmas(v, voice_geometry(v))
        d1.start()

        @pl.when(need2)
        def _():
            d2.start()
        return carry

    for _v in range(nv):
        start_body(_v, 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (K, LANE), 1)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (K, LANE), 0) * LANE + lane

    # ---- per-voice: align images + build the fully-resolved masked stream
    def build_body(v, carry):
        g = voice_geometry(v)
        rb, row1, q1, D, row2, q2, need2, ln, hl = g
        d1, d2, _ = dmas(v, g)
        d1.wait()

        @pl.when(need2)
        def _():
            d2.wait()

        # Aligned stream windows: img(0)[m] = stream sample (rb + m);
        # img(1)[m] = stream sample (ls + m - D), the post-seam image in
        # the same frame.  One dynamic lane-roll + a two-row merge per
        # image replaces all per-row copies of the general kernel.  DMA
        # data sits at span rows [PADR, PADR+fchunks); the PADR leading
        # pad rows keep the slice start non-negative even for image 2,
        # whose c goes down to -(K+1) when the seam sits near the end of
        # the block window (rows below the seam read pad garbage, and
        # every such read is masked by (m >= D) below; the clamp guards
        # the huge negative c of the no-seam case, where image 2 is never
        # selected).
        def img(i, q):
            f = q & (LANE - 1)
            c = (q - f) >> 7                               # exact; may be <0
            S = span_ref[v, i, pl.ds(jnp.maximum(PADR + c, 0), K + 1)]
            # pltpu.roll takes non-negative shifts; a left-rotate by f is
            # a right-rotate by (LANE - f) mod LANE.
            rolled = pltpu.roll(S, (LANE - f) & (LANE - 1), 1)
            return jnp.where(lane < LANE - f, rolled[:K], rolled[1:])

        sw_ref[v, 0] = img(0, q1)
        lc = jnp.maximum(ln - 1, 0) - rb
        # rb >= 0 required even for looping voices: a not-yet-wrapped loop
        # (delayed start / first block) has pre-start history that must be
        # masked to silence by the slow path's (mj >= -rb) mask.
        fast = jnp.where(hl, ~need2 & (rb >= 0),
                         (rb >= 0) & (lc >= T + taps - 1))

        @pl.when(~fast)
        def _():
            sw_ref[v, 1] = img(1, q2)
        return carry

    for _v in range(nv):
        build_body(_v, 0)

    # ---- per-voice tap loop over the aligned windows ---------------------
    # Reads come straight from the sw scratch (Mosaic folds the ref read
    # into the lane rotate) and every tap's masks are computed
    # independently — more ILP than masking the stream once up front (the
    # fused-mask form measured ~60% slower).  Voices whose whole window is
    # in-bounds with no loop seam — the overwhelming majority of any real
    # scene — take a mask-free body (program-level branch per voice, the
    # Pallas analog of the reference's per-voice kernel dispatch).
    def taps_body(v, carry):
        rb, row1, q1, D, row2, q2, need2, ln, hl = voice_geometry(v)
        sw1 = sw_ref[v, 0]
        lc = jnp.maximum(ln - 1, 0) - rb                    # clamp threshold
        wbase = (v0 + v) * taps
        fast = jnp.where(hl, ~need2 & (rb >= 0),
                         (rb >= 0) & (lc >= T + taps - 1))

        @pl.when(fast)
        def _():
            acc = jnp.zeros((rows, LANE), jnp.float32)
            for j in range(taps):
                jl = (LANE - j) % LANE
                a1 = pltpu.roll(sw1, jl, 1)
                val = jnp.where(lane < LANE - j, a1,
                                pltpu.roll(a1, K - 1, 0))
                acc = acc + w_sref[wbase + j] * val[:rows]
            out_ref[v] = acc

        @pl.when(~fast)
        def _():
            sw2 = sw_ref[v, 1]
            # Non-loop end clamp duplicates the final frame
            # (voice.cpp:493-505): extract stream sample (ln-1) by masked
            # reduction, then splat it over the past-end region.
            lci = jnp.clip(lc, 0, T + taps - 1)
            last = jnp.sum(jnp.where(m_iota == lci, sw1, 0.0))
            mthresh = -rb                                   # s>=0 <=> m>=-rb
            acc = jnp.zeros((rows, LANE), jnp.float32)
            for j in range(taps):
                jl = (LANE - j) % LANE       # left-rotate j as right-rotate
                a1 = pltpu.roll(sw1, jl, 1)
                val1 = jnp.where(lane < LANE - j, a1,
                                 pltpu.roll(a1, K - 1, 0))
                a2 = pltpu.roll(sw2, jl, 1)
                val2 = jnp.where(lane < LANE - j, a2,
                                 pltpu.roll(a2, K - 1, 0))
                mj = m_iota + j
                val = jnp.where(hl & (mj >= D), val2, val1)
                val = jnp.where(~hl & (mj > lc), last, val)
                val = jnp.where((mj >= mthresh) & (ln > 0), val, 0.0)
                acc = acc + w_sref[wbase + j] * val[:rows]
            out_ref[v] = acc
        return carry

    for _v in range(nv):
        taps_body(_v, 0)


@functools.partial(jax.jit, static_argnames=("T", "taps", "nv"))
def _resample_unit(meta, w, pool2d, *, T, taps, nv=NV):
    V = meta.shape[0] // 8
    rows = T // LANE
    K = rows + 1
    assert V % nv == 0 and T % LANE == 0
    fchunks = rows + (taps + 127) // 128 + 4    # window + align/clip slop
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V // nv,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # pool (HBM)
        ],
        out_specs=pl.BlockSpec((nv, rows, LANE), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nv, 2, K + 1 + fchunks, LANE), jnp.float32),
            pltpu.VMEM((nv, 2, K, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((nv, 2)),
        ],
    )
    kernel = functools.partial(_kernel, T=T, taps=taps,
                               pool_rows=pool2d.shape[0], nv=nv,
                               fchunks=fchunks)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, rows, LANE), jnp.float32),
    )(meta, w.reshape(-1), pool2d)
    return out.reshape(V, T)


def _kernel_shared(meta_sref,                # [V*8] int32 scalar prefetch
                   w_sref,                   # [V*taps] f32 scalar prefetch
                   ch_sref,                  # [2 + 2*(n256+n64)] int32
                   pool_ref,                 # HBM [P/128, 128]
                   out_ref,                  # [NV, rows, LANE] VMEM
                   pvm_ref, sw_ref, sems,
                   *, T: int, taps: int, nv: int, n256: int, n64: int,
                   pvm_rows: int):
    """Shared-pool unit resampler: program 0 DMAs the merged active-buffer
    regions into one persistent VMEM image (scratch survives the sequential
    TPU grid); every voice then slices its aligned window straight from
    VMEM.  Replaces the per-voice span DMAs of `_kernel` — for scenes where
    many voices share buffers (the common case: the reference's app model
    is few buffers, many sources) this cuts both DMA descriptors and HBM
    read bytes by the voices-per-buffer factor."""
    rows = T // LANE
    center = taps // 2 - 1
    K = rows + 1
    v0 = pl.program_id(0) * nv

    # ---- program 0: stage the pool regions ---------------------------------
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
        b = (v0 + v) * 8
        return (meta_sref[b + 0], meta_sref[b + 1], meta_sref[b + 2],
                meta_sref[b + 3], meta_sref[b + 4] != 0,
                meta_sref[b + 5] != 0, meta_sref[b + 6])

    def voice_geometry(v):
        # Same stream geometry as `_kernel`, but addresses are VMEM-image
        # elements (the host baked region relocation + PADMAX*LANE into
        # `off`), so images are direct slices — no span decomposition.
        off, ln, ls, le, hl, hw, p0 = scalars(v)
        ll = jnp.maximum(le - ls, 1)
        b = p0 - center
        b = jnp.where(hl & hw & (b < ls), b + ll, b)
        rb = jnp.where(hl, b, jnp.minimum(b, jnp.maximum(ln - 1, 0)))
        D = jnp.where(hl, le - rb, jnp.int32(1 << 30))
        need2 = hl & (D < T + taps)
        return rb, off + rb, D, off + ls - D, need2, ln, hl

    lane = jax.lax.broadcasted_iota(jnp.int32, (K, LANE), 1)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (K, LANE), 0) * LANE + lane

    def build_body(v, carry):
        rb, a1, D, a2, need2, ln, hl = voice_geometry(v)

        def img(a):
            f = a & (LANE - 1)
            # The clamp only ever engages on the never-selected image 2 of
            # clamped non-loop voices (a ~ -2^30); genuine pre-start /
            # pre-seam slices stay in-bounds thanks to the PADMAX pad rows.
            r0 = jnp.clip((a - f) >> 7, 0, pvm_rows - (K + 1))
            S = pvm_ref[pl.ds(r0, K + 1)]
            rolled = pltpu.roll(S, (LANE - f) & (LANE - 1), 1)
            return jnp.where(lane < LANE - f, rolled[:K], rolled[1:])

        sw_ref[v, 0] = img(a1)
        lc = jnp.maximum(ln - 1, 0) - rb
        fast = jnp.where(hl, ~need2 & (rb >= 0),
                         (rb >= 0) & (lc >= T + taps - 1))

        @pl.when(~fast)
        def _():
            sw_ref[v, 1] = img(a2)
        return carry

    for _v in range(nv):
        build_body(_v, 0)

    # ---- per-voice tap loop: identical to `_kernel` ------------------------
    def taps_body(v, carry):
        rb, a1, D, a2, need2, ln, hl = voice_geometry(v)
        sw1 = sw_ref[v, 0]
        lc = jnp.maximum(ln - 1, 0) - rb
        wbase = (v0 + v) * taps
        fast = jnp.where(hl, ~need2 & (rb >= 0),
                         (rb >= 0) & (lc >= T + taps - 1))

        @pl.when(fast)
        def _():
            acc = jnp.zeros((rows, LANE), jnp.float32)
            for j in range(taps):
                jl = (LANE - j) % LANE
                a = pltpu.roll(sw1, jl, 1)
                val = jnp.where(lane < LANE - j, a,
                                pltpu.roll(a, K - 1, 0))
                acc = acc + w_sref[wbase + j] * val[:rows]
            out_ref[v] = acc

        @pl.when(~fast)
        def _():
            sw2 = sw_ref[v, 1]
            lci = jnp.clip(lc, 0, T + taps - 1)
            last = jnp.sum(jnp.where(m_iota == lci, sw1, 0.0))
            mthresh = -rb
            acc = jnp.zeros((rows, LANE), jnp.float32)
            for j in range(taps):
                jl = (LANE - j) % LANE
                x1 = pltpu.roll(sw1, jl, 1)
                val1 = jnp.where(lane < LANE - j, x1,
                                 pltpu.roll(x1, K - 1, 0))
                x2 = pltpu.roll(sw2, jl, 1)
                val2 = jnp.where(lane < LANE - j, x2,
                                 pltpu.roll(x2, K - 1, 0))
                mj = m_iota + j
                val = jnp.where(hl & (mj >= D), val2, val1)
                val = jnp.where(~hl & (mj > lc), last, val)
                val = jnp.where((mj >= mthresh) & (ln > 0), val, 0.0)
                acc = acc + w_sref[wbase + j] * val[:rows]
            out_ref[v] = acc
        return carry

    for _v in range(nv):
        taps_body(_v, 0)


@functools.partial(jax.jit, static_argnames=("T", "taps", "nv", "n256",
                                             "n64", "vrows"))
def _resample_unit_shared(meta, w, chunks, pool2d, *, T, taps, vrows,
                          n256, n64, nv=NV):
    V = meta.shape[0] // 8
    rows = T // LANE
    K = rows + 1
    assert V % nv == 0 and T % LANE == 0 and K + 1 <= PADMAX
    pvm_rows = PADMAX + vrows + K + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(V // nv,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # pool (HBM)
        ],
        out_specs=pl.BlockSpec((nv, rows, LANE), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((pvm_rows, LANE), jnp.float32),
            pltpu.VMEM((nv, 2, K, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((n256 + n64,)),
        ],
    )
    kernel = functools.partial(_kernel_shared, T=T, taps=taps, nv=nv,
                               n256=n256, n64=n64, pvm_rows=pvm_rows)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, rows, LANE), jnp.float32),
    )(meta, w.reshape(-1), chunks, pool2d)
    return out.reshape(V, T)


def shared_layout(src_off, src_len, loop_start, loop_end, has_loop, active,
                  taps: int, pool_rows: int):
    """Host plan for the shared-pool kernel.

    Merges the active voices' buffer extents into row-aligned pool regions,
    allocates them consecutively in the VMEM image, and emits the staging
    DMA chunk list (256-row bulk + 64-row tail descriptors).  Returns
    ``(chunks int32[2+2*(n256+n64)], off_vmem int32[V], n256, n64, vrows)``
    or ``None`` when the union exceeds the largest VMEM bucket (or a region
    is too close to the pool end for aligned staging) — callers then fall
    back to the per-voice-DMA kernel.
    """
    import numpy as np

    act = np.asarray(active, bool)
    off = np.asarray(src_off, np.int64)
    end = off + np.maximum(np.asarray(src_len, np.int64),
                           np.asarray(loop_end, np.int64)) + taps + 1
    iv = []
    for o, e in set(zip(off[act].tolist(), end[act].tolist())):
        iv.append((o >> 7, -(-e // 128)))
    iv.sort()
    regions = []                      # (pool_row0, rows) merged, 64-aligned
    for lo, hi in iv:
        if regions and lo <= regions[-1][0] + regions[-1][1]:
            pr, rr = regions[-1]
            regions[-1] = (pr, max(rr, hi - pr))
        else:
            regions.append((lo, hi - lo))
    regions = [(pr, -(-rr // CHUNK_ALIGN) * CHUNK_ALIGN)
               for pr, rr in regions]
    total = sum(rr for _, rr in regions)
    vrows = next((b for b in VROWS_BUCKETS if total <= b), None)
    if vrows is None:
        return None
    if any(pr + rr > pool_rows for pr, rr in regions):
        return None                   # staging would read past the pool
    c256, c64 = [], []
    vr = PADMAX
    deltas = []                       # (pool_row0, elem delta) per region
    for pr, rr in regions:
        deltas.append((pr, (vr - pr) * LANE))
        p, v = pr, vr
        while rr >= 256:
            c256.append((p, v))
            p, v, rr = p + 256, v + 256, rr - 256
        while rr > 0:
            c64.append((p, v))
            p, v, rr = p + 64, v + 64, rr - 64
        vr = v
    n256 = max(-(-len(c256) // _CNT_ALIGN) * _CNT_ALIGN, _CNT_ALIGN)
    n64 = max(-(-len(c64) // _CNT_ALIGN) * _CNT_ALIGN, _CNT_ALIGN)
    chunks = np.zeros(2 + 2 * (n256 + n64), np.int32)
    chunks[0], chunks[1] = len(c256), len(c64)
    if c256:
        chunks[2:2 + 2 * len(c256)] = np.asarray(c256, np.int32).ravel()
    if c64:
        b = 2 + 2 * n256
        chunks[b:b + 2 * len(c64)] = np.asarray(c64, np.int32).ravel()
    # Per-voice relocation: region containing off -> baked VMEM element
    # offset.  Inactive voices park at the image start (memory-safe; their
    # output is garbage that downstream masking already discards).
    off_vmem = np.full(off.shape, PADMAX * LANE, np.int64)
    starts = np.asarray([pr for pr, _ in deltas], np.int64)
    dvals = np.asarray([d for _, d in deltas], np.int64)
    if len(starts):
        ri = np.searchsorted(starts, off >> 7, side="right") - 1
        ri = np.clip(ri, 0, len(starts) - 1)
        reloc = off + dvals[ri]
        off_vmem = np.where(act, reloc, off_vmem)
    return (chunks, off_vmem.astype(np.int32), int(n256), int(n64),
            int(vrows))


def resample_voices_unit_shared(pool2d, off_vmem, src_len, loop_start,
                                loop_end, has_loop, has_wrapped, pos_int,
                                weights, chunks, n: int, taps: int,
                                n256: int, n64: int, vrows: int,
                                nv: int = NV, active=None):
    """Shared-pool drop-in for resample_voices_unit.

    ``off_vmem``/``chunks`` come from shared_layout (baked VMEM-image
    addresses); eligibility beyond the unit plan's: the active regions fit
    a VROWS bucket (host-checked by shared_layout returning non-None).

    ``active`` zeroes inactive rows' geometry: they park at the image
    start whose leading pad rows are *uninitialized* VMEM, and the fused
    super-block consumer folds the active mask into a gain multiply —
    0*NaN would poison the mix and persist via the HRTF history.  With
    src_len==0/has_loop off the kernel's slow path masks every tap to an
    exact 0.0 via select (never multiply), so no scratch value escapes."""
    if active is not None:
        src_len = jnp.where(active, src_len, 0)
        has_loop = has_loop & active
        pos_int = jnp.where(active, pos_int, 0)
        loop_start = jnp.where(active, loop_start, 0)
        loop_end = jnp.where(active, loop_end, 1)
    z = jnp.zeros_like(off_vmem)
    meta = jnp.stack([off_vmem, src_len, loop_start, loop_end,
                      has_loop.astype(jnp.int32),
                      has_wrapped.astype(jnp.int32),
                      pos_int, z], axis=1).astype(jnp.int32).reshape(-1)
    return _resample_unit_shared(meta, weights, chunks, pool2d, T=n,
                                 taps=taps, vrows=vrows, n256=n256, n64=n64,
                                 nv=nv)


def resample_voices_unit(pool2d, src_off, src_len, loop_start, loop_end,
                         has_loop, has_wrapped, pos_int, weights,
                         n: int, taps: int, nv: int = NV):
    """Drop-in for resample_voices when every active increment == 1<<16.

    ``pool2d`` in [P/128, 128] layout; ``weights`` [V, taps] from
    unit_weights_np.  Requires n % 128 == 0, V % nv == 0, and
    loop_len >= n + taps for looping voices (host-checked).
    """
    z = jnp.zeros_like(src_off)
    meta = jnp.stack([src_off, src_len, loop_start, loop_end,
                      has_loop.astype(jnp.int32),
                      has_wrapped.astype(jnp.int32),
                      pos_int, z], axis=1).astype(jnp.int32).reshape(-1)
    return _resample_unit(meta, weights, pool2d, T=n, taps=taps, nv=nv)
