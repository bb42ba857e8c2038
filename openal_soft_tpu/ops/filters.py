"""Batched IIR filters: biquads, band splitter.

The reference applies 2nd-order IIRs per voice channel sequentially
(core/filters/biquad.cpp TDF2 loop, core/filters/splitter.cpp).  Here the
recurrences run as ``lax.scan`` over time with the full line population in
the lanes — V-way parallel, sample-sequential — reproducing the reference's
per-sample arithmetic exactly (including the 8-step / 32-samples-per-step
coefficient interpolation schedule of BiquadInterpFilter).

A faster chunked state-space formulation can swap in behind the same API
later; the scan form is the semantic reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

f32 = jnp.float32

INTERP_STEPS = 8
SAMPLES_PER_STEP = 32
INTERP_SAMPLES = INTERP_STEPS * SAMPLES_PER_STEP  # 256


def biquad_dual_interp(x: jax.Array, z: jax.Array, coeffs: jax.Array,
                       target: jax.Array, counter: jax.Array):
    """Dual (chained lp+hp) interpolating biquad over a block.

    Mirrors BiquadInterpFilter::dualProcess (biquad.cpp:284-343): both
    filters share one interpolation counter; every 32 samples the current
    coefficients lerp toward the targets with a = 1/(steps_left+1).

    Args:
      x: [L, T] input samples.
      z: [L, 2, 2] filter states ([:, filter, (z1, z2)]).
      coeffs: [L, 2, 5] current coefficients ([b0, b1, b2, a1, a2]).
      target: [L, 2, 5] target coefficients.
      counter: [L] int32 samples left in the interpolation (0 or 256 at block
        boundaries; the schedule assumes counter % 32 == 0).
    Returns: (y [L, T], z' [L, 2, 2], coeffs' [L, 2, 5], counter' [L]).
    """
    T = x.shape[1]

    def seg_step(carry, xs_seg):
        zc, cf, cnt = carry
        # Process SAMPLES_PER_STEP samples with the current coefficients.
        def sample_step(zin, xin):
            z0, = (zin,)
            y0 = xin * cf[:, 0, 0] + z0[:, 0, 0]
            z01 = xin * cf[:, 0, 1] - y0 * cf[:, 0, 3] + z0[:, 0, 1]
            z02 = xin * cf[:, 0, 2] - y0 * cf[:, 0, 4]
            y1 = y0 * cf[:, 1, 0] + z0[:, 1, 0]
            z11 = y0 * cf[:, 1, 1] - y1 * cf[:, 1, 3] + z0[:, 1, 1]
            z12 = y0 * cf[:, 1, 2] - y1 * cf[:, 1, 4]
            znew = jnp.stack([jnp.stack([z01, z02], -1),
                              jnp.stack([z11, z12], -1)], 1)
            return znew, y1

        zc, ys = jax.lax.scan(sample_step, zc, xs_seg)

        # End-of-segment coefficient update (biquad.cpp:310-331).
        cnt2 = jnp.maximum(cnt - SAMPLES_PER_STEP, 0)
        steps_left = cnt2 // SAMPLES_PER_STEP
        a = 1.0 / (steps_left.astype(f32) + 1.0)
        lerped = cf + (target - cf) * a[:, None, None]
        was_active = (cnt > 0)[:, None, None]
        done = (cnt2 == 0)[:, None, None]
        cf = jnp.where(was_active, jnp.where(done, target, lerped), cf)
        return (zc, cf, cnt2), ys

    nseg = (T + SAMPLES_PER_STEP - 1) // SAMPLES_PER_STEP
    pad = nseg * SAMPLES_PER_STEP - T
    xs = jnp.pad(x, ((0, 0), (0, pad))).T.reshape(nseg, SAMPLES_PER_STEP, -1)
    (z, coeffs, counter), ys = jax.lax.scan(seg_step, (z, coeffs, counter), xs)
    y = ys.reshape(nseg * SAMPLES_PER_STEP, -1)[:T].T
    return y, z, coeffs, counter


def _chunk_coeff_schedule(coeffs, target, counter, n_chunks: int, chunk: int):
    """Per-chunk coefficient sequence (the reference's 32-sample lerp cadence)."""
    def sched(carry, _):
        cf, cnt = carry
        out = cf
        cnt2 = jnp.maximum(cnt - chunk, 0)
        steps_left = cnt2 // chunk
        a = 1.0 / (steps_left.astype(f32) + 1.0)
        lerped = cf + (target - cf) * a[:, None, None]
        was_active = (cnt > 0)[:, None, None]
        done = (cnt2 == 0)[:, None, None]
        cf = jnp.where(was_active, jnp.where(done, target, lerped), cf)
        return (cf, cnt2), out

    (cf_end, cnt_end), cf_all = jax.lax.scan(sched, (coeffs, counter), None,
                                             length=n_chunks, unroll=True)
    return cf_all, cf_end, cnt_end


def _biquad_chunked_single(x, z, cf_all, chunk: int):
    """One TDF2 biquad over [L, T] via chunk-parallel state-space recurrence.

    cf_all: [N, L, 5] per-chunk coefficients (constant within each chunk).
    z: [L, 2] TDF2 states.  The 2x2 companion form per biquad stays well
    conditioned (a single 4x4 cascade form does not for near-DC shelves).
    Returns (y [L, T], z' [L, 2]).
    """
    L, T = x.shape
    N = T // chunk
    b0 = cf_all[..., 0]
    # Balanced companion form: similarity transform s1 → s1/δ with
    # δ = sqrt(|a2|) makes A nearly a rotation for complex pole pairs,
    # keeping transient growth of A^k (and hence f32 error amplification)
    # near 1 even for near-DC shelf filters.
    a1c, a2c = cf_all[..., 3], cf_all[..., 4]
    # One fixed basis per line (from chunk 0) so inter-chunk state handoff
    # needs no conversion; coefficients only drift slightly within a block.
    delta = jnp.sqrt(jnp.maximum(jnp.abs(a2c[0]), 1e-8))[None, :]   # [1, L]
    A = jnp.stack([
        jnp.stack([-a1c, jnp.broadcast_to(delta, a1c.shape)], -1),
        jnp.stack([-a2c / delta, jnp.zeros_like(b0)], -1)], -2)     # [N,L,2,2]
    B = jnp.stack([cf_all[..., 1] - a1c * b0,
                   (cf_all[..., 2] - a2c * b0) / delta], -1)        # [N,L,2]

    # Transform incoming TDF2 state into the balanced basis; delta is
    # per-chunk but the state enters with chunk 0's coefficients.
    z = jnp.stack([z[:, 0], z[:, 1] / delta[0]], -1)  # into balanced basis

    xs = jnp.swapaxes(x.T.reshape(N, chunk, L), 0, 1)               # [K,N,L]

    # All the 2x2 state-space products below are written as explicit
    # elementwise arithmetic: einsum on [.., 2, 2] batches lowers to padded
    # MXU dots that cost ~100x the flops, especially inside the outer
    # per-block scan.  The short scans are unrolled for the same reason.
    A00, A01 = A[..., 0, 0], A[..., 0, 1]
    A10, A11 = A[..., 1, 0], A[..., 1, 1]
    B0, B1 = B[..., 0], B[..., 1]

    # Zero-state responses + input-driven end states, all chunks in parallel.
    def zs_step(s, xk):
        s0, s1 = s[..., 0], s[..., 1]
        y = s0 + b0 * xk
        n0 = A00 * s0 + A01 * s1 + B0 * xk
        n1 = A10 * s0 + A11 * s1 + B1 * xk
        return jnp.stack([n0, n1], axis=-1), y

    s_drive, y_zero = jax.lax.scan(zs_step, jnp.zeros((N, L, 2), x.dtype), xs,
                                   unroll=True)

    # A^chunk by repeated squaring (chunk is a power of two).
    M00, M01, M10, M11 = A00, A01, A10, A11
    for _ in range(chunk.bit_length() - 1):
        M00, M01, M10, M11 = (M00 * M00 + M01 * M10, M00 * M01 + M01 * M11,
                              M10 * M00 + M11 * M10, M10 * M01 + M11 * M11)

    # Sequential chunk-state recurrence (N tiny steps).
    def chain(s, inputs):
        m00, m01, m10, m11, d = inputs
        s0, s1 = s[..., 0], s[..., 1]
        n0 = m00 * s0 + m01 * s1 + d[..., 0]
        n1 = m10 * s0 + m11 * s1 + d[..., 1]
        return jnp.stack([n0, n1], axis=-1), s

    z_out, s_starts = jax.lax.scan(chain, z, (M00, M01, M10, M11, s_drive),
                                   unroll=True)

    # Initial-state responses y_state[k] = (C·A^k)·s_start with C = [1, 0].
    def back_step(w, _):
        w0_, w1_ = w[..., 0], w[..., 1]
        return jnp.stack([A00 * w0_ + A10 * w1_,
                          A01 * w0_ + A11 * w1_], axis=-1), w

    w0 = jnp.broadcast_to(jnp.array([1.0, 0.0], x.dtype), (N, L, 2))
    _, ws = jax.lax.scan(back_step, w0, None, length=chunk,
                         unroll=True)                            # [K,N,L,2]
    y_state = (ws[..., 0] * s_starts[None, ..., 0]
               + ws[..., 1] * s_starts[None, ..., 1])            # [K,N,L]

    y = jnp.transpose(y_zero + y_state, (2, 1, 0)).reshape(L, T)
    z_out = jnp.stack([z_out[:, 0], z_out[:, 1] * delta[-1]], -1)
    return y, z_out


def linear2_chunked(x: jax.Array, s: jax.Array, A: jax.Array, B: jax.Array,
                    C: jax.Array, D: jax.Array, chunk: int = SAMPLES_PER_STEP):
    """Generic 2-state linear filter y = C·s + D·x, s' = A·s + B·x,
    chunk-parallel like _biquad_chunked_single but with per-line constant
    (traced) state-space matrices — used by filters whose coefficients are
    fixed within a block (e.g. the vocal morpher's formant SVFs,
    alc/effects/vmorpher.cpp:109-138).

    x: [L, T]; s: [L, 2]; A: [L, 2, 2]; B/C: [L, 2]; D: [L].
    Returns (y [L, T], s' [L, 2]).
    """
    L, T = x.shape
    N = T // chunk
    A00 = jnp.broadcast_to(A[:, 0, 0], (N, L))
    A01 = jnp.broadcast_to(A[:, 0, 1], (N, L))
    A10 = jnp.broadcast_to(A[:, 1, 0], (N, L))
    A11 = jnp.broadcast_to(A[:, 1, 1], (N, L))
    B0 = jnp.broadcast_to(B[:, 0], (N, L))
    B1 = jnp.broadcast_to(B[:, 1], (N, L))
    C0, C1, Dv = C[:, 0], C[:, 1], D

    xs = jnp.swapaxes(x.T.reshape(N, chunk, L), 0, 1)               # [K,N,L]

    def zs_step(st, xk):
        s0, s1 = st[..., 0], st[..., 1]
        y = C0 * s0 + C1 * s1 + Dv * xk
        n0 = A00 * s0 + A01 * s1 + B0 * xk
        n1 = A10 * s0 + A11 * s1 + B1 * xk
        return jnp.stack([n0, n1], axis=-1), y

    s_drive, y_zero = jax.lax.scan(zs_step, jnp.zeros((N, L, 2), x.dtype), xs,
                                   unroll=True)

    M00, M01, M10, M11 = A00, A01, A10, A11
    for _ in range(chunk.bit_length() - 1):
        M00, M01, M10, M11 = (M00 * M00 + M01 * M10, M00 * M01 + M01 * M11,
                              M10 * M00 + M11 * M10, M10 * M01 + M11 * M11)

    def chain(st, inputs):
        m00, m01, m10, m11, d = inputs
        s0, s1 = st[..., 0], st[..., 1]
        n0 = m00 * s0 + m01 * s1 + d[..., 0]
        n1 = m10 * s0 + m11 * s1 + d[..., 1]
        return jnp.stack([n0, n1], axis=-1), st

    s_out, s_starts = jax.lax.scan(chain, s, (M00, M01, M10, M11, s_drive),
                                   unroll=True)

    def back_step(w, _):
        w0_, w1_ = w[..., 0], w[..., 1]
        return jnp.stack([A00 * w0_ + A10 * w1_,
                          A01 * w0_ + A11 * w1_], axis=-1), w

    w0 = jnp.stack([jnp.broadcast_to(C0, (N, L)),
                    jnp.broadcast_to(C1, (N, L))], axis=-1)
    _, ws = jax.lax.scan(back_step, w0, None, length=chunk, unroll=True)
    y_state = (ws[..., 0] * s_starts[None, ..., 0]
               + ws[..., 1] * s_starts[None, ..., 1])               # [K,N,L]

    y = jnp.transpose(y_zero + y_state, (2, 1, 0)).reshape(L, T)
    return y, s_out


def biquad_dual_interp_chunked(x: jax.Array, z: jax.Array, coeffs: jax.Array,
                               target: jax.Array, counter: jax.Array,
                               chunk: int = SAMPLES_PER_STEP):
    """Chunk-parallel equivalent of biquad_dual_interp.

    Sequential depth ~3*(32+32) steps instead of T.  f32 rounding differs
    from the sample-sequential TDF2 by a few ulps (state-space
    reassociation), within the renderer's 1e-5 comparison budget.
    """
    L, T = x.shape
    assert T % chunk == 0
    cf_all, cf_end, cnt_end = _chunk_coeff_schedule(coeffs, target, counter,
                                                    T // chunk, chunk)
    y0, z0 = _biquad_chunked_single(x, z[:, 0, :], cf_all[:, :, 0, :], chunk)
    y1, z1 = _biquad_chunked_single(y0, z[:, 1, :], cf_all[:, :, 1, :], chunk)
    return y1, jnp.stack([z0, z1], axis=1), cf_end, cnt_end


def host_advance_interp(coeffs, target, counter, n: int):
    """Host-side mirror of the device coefficient schedule after ``n`` samples.

    numpy f32 arrays, same lerp order as the device; lets the host avoid a
    device→host readback of filter coefficients between blocks.
    """
    import numpy as np

    coeffs = coeffs.copy()
    counter = counter.copy()
    for _ in range(n // SAMPLES_PER_STEP):
        active = counter > 0
        counter = np.where(active, counter - SAMPLES_PER_STEP, 0)
        steps_left = counter // SAMPLES_PER_STEP
        a = (1.0 / (steps_left + 1.0)).astype(np.float32)
        lerped = (coeffs + (target - coeffs) * a[:, None, None]).astype(np.float32)
        coeffs = np.where(active[:, None, None],
                          np.where((counter == 0)[:, None, None], target, lerped), coeffs)
    return coeffs, counter


# --- Band splitter (core/filters/splitter.cpp) -------------------------------


def band_splitter_coeff(f0norm) -> jax.Array:
    """BandSplitter::init coefficient from the normalized crossover."""
    import numpy as np

    w = np.float32(2.0 * np.pi) * np.float32(min(float(f0norm), 0.49))
    cw = np.float32(np.cos(w))
    if cw > np.finfo(np.float32).eps:
        return np.float32((np.float32(np.sin(w)) - np.float32(1.0)) / cw)
    return np.float32(cw * np.float32(-0.5))


def band_split(x: jax.Array, state: jax.Array, coeff: jax.Array):
    """Split into (hp, lp) bands; state [L, 3] = (lp_z1, lp_z2, ap_z1)."""
    ap = coeff
    lp = coeff * 0.5 + 0.5

    def step(st, xin):
        lp_z1, lp_z2, ap_z1 = st[:, 0], st[:, 1], st[:, 2]
        d0 = (xin - lp_z1) * lp
        lp_y0 = lp_z1 + d0
        lp_z1 = lp_y0 + d0
        d1 = (lp_y0 - lp_z2) * lp
        lp_y1 = lp_z2 + d1
        lp_z2 = lp_y1 + d1
        ap_y = xin * ap + ap_z1
        ap_z1 = xin - ap_y * ap
        hp = ap_y - lp_y1
        return jnp.stack([lp_z1, lp_z2, ap_z1], -1), (hp, lp_y1)

    state, (hps, lps) = jax.lax.scan(step, state, x.T)
    return hps.T, lps.T, state


def band_split_hf_scale(x: jax.Array, state: jax.Array, coeff: jax.Array,
                        hfscale: jax.Array, variant_3arg: bool = False):
    """processHfScale: scale the high band, keep the low band.

    ``variant_3arg`` reproduces the out-of-place variant's state update
    (splitter.cpp:79 uses ``lp_z1 = lp_y0 + d0*lp_coeff``) which differs
    from the in-place variant (``lp_z1 = lp_y0 + d0``, splitter.cpp:113).
    """
    ap = coeff
    lp = coeff * 0.5 + 0.5

    def step(st, inputs):
        xin, hfs = inputs
        lp_z1, lp_z2, ap_z1 = st[:, 0], st[:, 1], st[:, 2]
        d0 = (xin - lp_z1) * lp
        lp_y0 = lp_z1 + d0
        lp_z1 = lp_y0 + (d0 * lp if variant_3arg else d0)
        d1 = (lp_y0 - lp_z2) * lp
        lp_y1 = lp_z2 + d1
        lp_z2 = lp_y1 + d1
        ap_y = xin * ap + ap_z1
        ap_z1 = xin - ap_y * ap
        y = (ap_y - lp_y1) * hfs + lp_y1
        return jnp.stack([lp_z1, lp_z2, ap_z1], -1), y

    hfscale = jnp.asarray(hfscale)
    if hfscale.ndim <= 1:   # scalar or per-row → broadcast over time
        hf2d = jnp.broadcast_to(jnp.reshape(hfscale, (-1, 1)),
                                (x.shape[0], x.shape[1]))
    else:
        hf2d = hfscale
    state, ys = jax.lax.scan(step, state, (x.T, hf2d.T))
    return ys.T, state


def band_split_scale(x: jax.Array, state: jax.Array, coeff: jax.Array,
                     hfscale: jax.Array, lfscale: jax.Array):
    """processScale: separate high/low band gains (ambisonic up-order mix)."""
    ap = coeff
    lp = coeff * 0.5 + 0.5

    def step(st, xin):
        lp_z1, lp_z2, ap_z1 = st[:, 0], st[:, 1], st[:, 2]
        d0 = (xin - lp_z1) * lp
        lp_y0 = lp_z1 + d0
        lp_z1 = lp_y0 + d0
        d1 = (lp_y0 - lp_z2) * lp
        lp_y1 = lp_z2 + d1
        lp_z2 = lp_y1 + d1
        ap_y = xin * ap + ap_z1
        ap_z1 = xin - ap_y * ap
        y = (ap_y - lp_y1) * hfscale + lp_y1 * lfscale
        return jnp.stack([lp_z1, lp_z2, ap_z1], -1), y

    state, ys = jax.lax.scan(step, state, x.T)
    return ys.T, state


class BandSplitterKernels:
    """Chunk-parallel band splitter with precomputed (f64→f32) kernels.

    The splitter coefficient is fixed per device (crossover / sample rate),
    so everything except the 32-step chunk-state chain becomes constant
    matrices: lower-triangular Toeplitz kernels for the zero-state low-pass
    and all-pass responses, a drive matrix for chunk-end states, C·A^k rows
    for the initial-state responses, and A^K for the chunk recurrence.
    State layout matches the sequential scans: (lp_z1, lp_z2, ap_z1).
    """

    def __init__(self, coeff: float, variant_3arg: bool = False,
                 chunk: int = SAMPLES_PER_STEP):
        import numpy as np

        self.chunk = K = chunk
        apc = float(coeff)
        lpc = apc * 0.5 + 0.5
        # State space (f64): s = (lp_z1, lp_z2, ap_z1)
        #   lp_y0 = (1-lpc) z1 + lpc x
        #   z1'   = z1 + d0*(1 [+ lpc])   (3-arg variant uses d0*lpc)
        #   lp_y1 = (1-lpc) z2 + lpc lp_y0
        #   z2'   = (1-2lpc) z2 + 2 lpc lp_y0
        #   ap_y  = apc x + z3 ;  z3' = (1-apc^2) x - apc z3
        z1g = lpc * (1.0 + lpc) if variant_3arg else 2.0 * lpc
        A = np.array([
            [1.0 - z1g, 0.0, 0.0],
            [2.0 * lpc * (1.0 - lpc), 1.0 - 2.0 * lpc, 0.0],
            [0.0, 0.0, -apc]])
        B = np.array([z1g, 2.0 * lpc * lpc, 1.0 - apc * apc])
        C_lp = np.array([lpc * (1.0 - lpc), 1.0 - lpc, 0.0])
        D_lp = lpc * lpc
        C_ap = np.array([0.0, 0.0, 1.0])
        D_ap = apc

        Apow = [np.eye(3)]
        for _ in range(K):
            Apow.append(A @ Apow[-1])
        T_lp = np.zeros((K, K))
        T_ap = np.zeros((K, K))
        for k in range(K):
            T_lp[k, k] = D_lp
            T_ap[k, k] = D_ap
            for i in range(k):
                T_lp[k, i] = C_lp @ Apow[k - 1 - i] @ B
                T_ap[k, i] = C_ap @ Apow[k - 1 - i] @ B
        G = np.stack([Apow[K - 1 - i] @ B for i in range(K)], axis=1)  # [3,K]
        W_lp = np.stack([C_lp @ Apow[k] for k in range(K)])            # [K,3]
        W_ap = np.stack([C_ap @ Apow[k] for k in range(K)])
        # numpy: trace-time constants (backend-agnostic; see device notes)
        self.T_lp = T_lp.astype(np.float32)
        self.T_ap = T_ap.astype(np.float32)
        self.G = G.astype(np.float32)
        self.W_lp = W_lp.astype(np.float32)
        self.W_ap = W_ap.astype(np.float32)
        self.M = Apow[K].astype(np.float32)

    def _run(self, x: jax.Array, state: jax.Array):
        """Returns (lp [D,T], ap [D,T], state' [D,3])."""
        D, T = x.shape
        K = self.chunk
        N = T // K
        hi = jax.lax.Precision.HIGHEST
        xc = x.reshape(D, N, K)
        lp_zero = jnp.einsum("dnk,mk->dnm", xc, self.T_lp, precision=hi)
        ap_zero = jnp.einsum("dnk,mk->dnm", xc, self.T_ap, precision=hi)
        drive = jnp.einsum("dnk,jk->dnj", xc, self.G, precision=hi)

        def chain(s, dk):
            return jnp.einsum("ij,dj->di", self.M, s, precision=hi) + dk, s

        s_out, s_starts = jax.lax.scan(chain, state,
                                       jnp.swapaxes(drive, 0, 1), unroll=True)
        s_starts = jnp.swapaxes(s_starts, 0, 1)                  # [D,N,3]
        lp = lp_zero + jnp.einsum("dnj,mj->dnm", s_starts, self.W_lp,
                                  precision=hi)
        ap = ap_zero + jnp.einsum("dnj,mj->dnm", s_starts, self.W_ap,
                                  precision=hi)
        return lp.reshape(D, T), ap.reshape(D, T), s_out

    def split(self, x: jax.Array, state: jax.Array):
        """(hp, lp, state') — BandSplitter::process."""
        lp, ap, s = self._run(x, state)
        return ap - lp, lp, s

    def hf_scale(self, x: jax.Array, state: jax.Array, hfscale: jax.Array):
        """processHfScale: (ap-lp)*hf + lp."""
        lp, ap, s = self._run(x, state)
        hf = jnp.reshape(hfscale, (-1, 1))
        return (ap - lp) * hf + lp, s

    def scale(self, x: jax.Array, state: jax.Array, hfscale, lfscale):
        """processScale: separate hf/lf gains."""
        lp, ap, s = self._run(x, state)
        hf = jnp.reshape(jnp.asarray(hfscale), (-1, 1))
        lf = jnp.reshape(jnp.asarray(lfscale), (-1, 1))
        return (ap - lp) * hf + lp * lf, s


def all_pass(x: jax.Array, z1: jax.Array, coeff: jax.Array):
    """processAllPass: phase-matching all-pass; z1 [L]."""
    def step(z, xin):
        y = xin * coeff + z
        z = xin - y * coeff
        return z, y

    z1, ys = jax.lax.scan(step, z1, x.T)
    return ys.T, z1
