"""Near-field compensation filters (core/filters/nfc.cpp).

Each ambisonic order 1..4 has a shelf-ish IIR built as bass-boost (source
distance, per-voice ``adjust(w0)``) x bass-cut (speaker/control distance,
per-device ``init(w1)``).  The per-voice coefficient math runs host-side in
f32 with the reference's exact op order; the per-sample recurrences run
batched over voices through the chunk-parallel 2-state kernel
(ops/filters.linear2_chunked), with order-3/4 as two cascaded sections.

Host layout per voice (NUM_COEFFS=14):
  [a0_1, b1_1,  a0_2, b1_2, b2_2,  a0_3, b1_3, b2_3, b3_3,
   a0_4, b1_4, b2_4, b3_4, b4_4]
Device constants per device (from w1): the feedback a-coefficients.
State layout per voice (NUM_STATES=10): order1 z0 | order2 z0 z1 |
order3 z0 z1 z2 | order4 z0 z1 z2 z3.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .filters import linear2_chunked

f32 = np.float32

SPEED_OF_SOUND = f32(343.3)           # core/context.h:32
NUM_COEFFS = 14
NUM_STATES = 10

_B1 = (1.0,)
_B2 = (3.0, 3.0)
_B3 = (3.6778, 6.4595, 2.3222)
_B4 = (4.2076, 11.4877, 5.7924, 9.1401)


class NfcDeviceConsts:
    """init(w1): base gains + fixed feedback coefficients (nfc.cpp:56-185)."""

    def __init__(self, w1: float) -> None:
        r = f32(0.5) * f32(w1)
        # order 1
        b00 = f32(_B1[0]) * r
        g0 = f32(1.0) + b00
        self.base1 = f32(1.0) / g0
        self.a1_1 = f32(2.0) * b00 / g0
        # order 2
        b10 = f32(_B2[0]) * r
        b11 = f32(_B2[1]) * (r * r)
        g1 = f32(1.0) + b10 + b11
        self.base2 = f32(1.0) / g1
        self.a1_2 = (f32(2.0) * b10 + f32(4.0) * b11) / g1
        self.a2_2 = f32(4.0) * b11 / g1
        # order 3 (2nd-order + 1st-order sections)
        b10 = f32(_B3[0]) * r
        b11 = f32(_B3[1]) * (r * r)
        b00 = f32(_B3[2]) * r
        g1 = f32(1.0) + b10 + b11
        g0 = f32(1.0) + b00
        self.base3 = f32(1.0) / (g1 * g0)
        self.a1_3 = (f32(2.0) * b10 + f32(4.0) * b11) / g1
        self.a2_3 = f32(4.0) * b11 / g1
        self.a3_3 = f32(2.0) * b00 / g0
        # order 4 (two 2nd-order sections)
        b10 = f32(_B4[0]) * r
        b11 = f32(_B4[1]) * (r * r)
        b00 = f32(_B4[2]) * r
        b01 = f32(_B4[3]) * (r * r)
        g1 = f32(1.0) + b10 + b11
        g0 = f32(1.0) + b00 + b01
        self.base4 = f32(1.0) / (g1 * g0)
        self.a1_4 = (f32(2.0) * b10 + f32(4.0) * b11) / g1
        self.a2_4 = f32(4.0) * b11 / g1
        self.a3_4 = (f32(2.0) * b00 + f32(4.0) * b01) / g0
        self.a4_4 = f32(4.0) * b01 / g0

    def adjust(self, w0: np.ndarray) -> np.ndarray:
        """Per-voice coefficients [V, NUM_COEFFS] (NfcFilterAdjust1..4)."""
        w0 = np.asarray(w0, f32)
        r = f32(0.5) * w0
        out = np.empty(w0.shape + (NUM_COEFFS,), f32)
        # order 1
        b00 = f32(_B1[0]) * r
        g0 = f32(1.0) + b00
        out[..., 0] = self.base1 * g0
        out[..., 1] = f32(2.0) * b00 / g0
        # order 2
        b10 = f32(_B2[0]) * r
        b11 = f32(_B2[1]) * (r * r)
        g1 = f32(1.0) + b10 + b11
        out[..., 2] = self.base2 * g1
        out[..., 3] = (f32(2.0) * b10 + f32(4.0) * b11) / g1
        out[..., 4] = f32(4.0) * b11 / g1
        # order 3
        b10 = f32(_B3[0]) * r
        b11 = f32(_B3[1]) * (r * r)
        b00 = f32(_B3[2]) * r
        g1 = f32(1.0) + b10 + b11
        g0 = f32(1.0) + b00
        out[..., 5] = self.base3 * (g1 * g0)
        out[..., 6] = (f32(2.0) * b10 + f32(4.0) * b11) / g1
        out[..., 7] = f32(4.0) * b11 / g1
        out[..., 8] = f32(2.0) * b00 / g0
        # order 4
        b10 = f32(_B4[0]) * r
        b11 = f32(_B4[1]) * (r * r)
        b00 = f32(_B4[2]) * r
        b01 = f32(_B4[3]) * (r * r)
        g1 = f32(1.0) + b10 + b11
        g0 = f32(1.0) + b00 + b01
        out[..., 9] = self.base4 * (g1 * g0)
        out[..., 10] = (f32(2.0) * b10 + f32(4.0) * b11) / g1
        out[..., 11] = f32(4.0) * b11 / g1
        out[..., 12] = (f32(2.0) * b00 + f32(4.0) * b01) / g0
        out[..., 13] = f32(4.0) * b01 / g0
        return out

    def identity_coeffs(self, n: int) -> np.ndarray:
        """Create-state coefficients (a0=1, b=a): exact passthrough."""
        out = np.empty((n, NUM_COEFFS), f32)
        out[:, 0], out[:, 1] = 1.0, self.a1_1
        out[:, 2], out[:, 3], out[:, 4] = 1.0, self.a1_2, self.a2_2
        out[:, 5:9] = [1.0, self.a1_3, self.a2_3, self.a3_3]
        out[:, 9:14] = [1.0, self.a1_4, self.a2_4, self.a3_4, self.a4_4]
        return out


def _sec2_ss(a0, a1, a2, b1, b2):
    """State space of the 2nd-order section (nfc.cpp NfcFilter2::process):
    y = a0*in - a1*z0 - a2*z1; out = y + b1*z0 + b2*z1; z1 += z0; z0 += y."""
    a1 = jnp.broadcast_to(jnp.asarray(a1, jnp.float32), a0.shape)
    a2 = jnp.broadcast_to(jnp.asarray(a2, jnp.float32), a0.shape)
    one = jnp.ones_like(a0)
    zero = jnp.zeros_like(a0)
    A = jnp.stack([jnp.stack([1.0 - a1, -a2], -1),
                   jnp.stack([one, one], -1)], -2)
    B = jnp.stack([a0, zero], -1)
    C = jnp.stack([b1 - a1, b2 - a2], -1)
    return A, B, C, a0


def _sec1_ss(a0, a1, b1):
    """1st-order section padded to 2 states."""
    a1 = jnp.broadcast_to(jnp.asarray(a1, jnp.float32), a0.shape)
    zero = jnp.zeros_like(a0)
    A = jnp.stack([jnp.stack([1.0 - a1, zero], -1),
                   jnp.stack([zero, zero], -1)], -2)
    B = jnp.stack([a0, zero], -1)
    C = jnp.stack([b1 - a1, zero], -1)
    return A, B, C, a0


def process_orders(x, z, cf, consts: NfcDeviceConsts, max_order: int):
    """Filter x [V, T] through the order-1..max_order NFC filters.

    z: [V, NUM_STATES]; cf: [V, NUM_COEFFS].
    Returns ([x1, .., x_maxorder] each [V, T], z').
    All sections across orders batch into single linear2_chunked calls
    (first-stage sections together, then the order-3/4 second stages).
    """
    V, T = x.shape
    outs = []
    zs = dict()

    stage1 = []   # (A, B, C, D, state slice, order)
    if max_order >= 1:
        stage1.append((_sec1_ss(cf[:, 0], jnp.float32(consts.a1_1),
                                cf[:, 1]), (0, 1), 1))
    if max_order >= 2:
        stage1.append((_sec2_ss(cf[:, 2], jnp.float32(consts.a1_2),
                                jnp.float32(consts.a2_2), cf[:, 3],
                                cf[:, 4]), (1, 3), 2))
    if max_order >= 3:
        stage1.append((_sec2_ss(cf[:, 5], jnp.float32(consts.a1_3),
                                jnp.float32(consts.a2_3), cf[:, 6],
                                cf[:, 7]), (3, 5), 3))
    if max_order >= 4:
        stage1.append((_sec2_ss(cf[:, 9], jnp.float32(consts.a1_4),
                                jnp.float32(consts.a2_4), cf[:, 10],
                                cf[:, 11]), (6, 8), 4))

    n1 = len(stage1)
    A = jnp.concatenate([jnp.broadcast_to(s[0][0], (V, 2, 2))
                         for s in stage1])
    B = jnp.concatenate([jnp.broadcast_to(s[0][1], (V, 2)) for s in stage1])
    C = jnp.concatenate([jnp.broadcast_to(s[0][2], (V, 2)) for s in stage1])
    D = jnp.concatenate([jnp.broadcast_to(s[0][3], (V,)) for s in stage1])
    # order-1 keeps only one real state; pack from z
    zslices = []
    for (_, (lo, hi), order) in stage1:
        zi = z[:, lo:hi]
        if hi - lo == 1:
            zi = jnp.concatenate([zi, jnp.zeros((V, 1), x.dtype)], axis=1)
        zslices.append(zi)
    zin = jnp.concatenate(zslices)
    xin = jnp.tile(x, (n1, 1))
    y1, z1o = linear2_chunked(xin, zin, A, B, C, D)

    new_z = [None] * NUM_STATES

    def put(lo, hi, val):
        for i in range(hi - lo):
            new_z[lo + i] = val[:, i]

    ys = {}
    for i, (_, (lo, hi), order) in enumerate(stage1):
        ys[order] = y1[i * V:(i + 1) * V]
        put(lo, hi, z1o[i * V:(i + 1) * V])

    # Second stages: order3 (1st-order sec), order4 (2nd-order sec).
    stage2 = []
    if max_order >= 3:
        stage2.append((_sec1_ss(jnp.ones_like(cf[:, 0]),
                                jnp.float32(consts.a3_3), cf[:, 8]),
                       (5, 6), 3))
    if max_order >= 4:
        stage2.append((_sec2_ss(jnp.ones_like(cf[:, 0]),
                                jnp.float32(consts.a3_4),
                                jnp.float32(consts.a4_4), cf[:, 12],
                                cf[:, 13]), (8, 10), 4))
    if stage2:
        n2 = len(stage2)
        A2 = jnp.concatenate([jnp.broadcast_to(s[0][0], (V, 2, 2))
                              for s in stage2])
        B2 = jnp.concatenate([jnp.broadcast_to(s[0][1], (V, 2))
                              for s in stage2])
        C2 = jnp.concatenate([jnp.broadcast_to(s[0][2], (V, 2))
                              for s in stage2])
        D2 = jnp.concatenate([jnp.broadcast_to(s[0][3], (V,))
                              for s in stage2])
        z2in = []
        for (_, (lo, hi), order) in stage2:
            zi = z[:, lo:hi]
            if hi - lo == 1:
                zi = jnp.concatenate([zi, jnp.zeros((V, 1), x.dtype)], axis=1)
            z2in.append(zi)
        x2in = jnp.concatenate([ys[s[2]] for s in stage2])
        y2, z2o = linear2_chunked(x2in, jnp.concatenate(z2in), A2, B2, C2, D2)
        for i, (_, (lo, hi), order) in enumerate(stage2):
            ys[order] = y2[i * V:(i + 1) * V]
            put(lo, hi, z2o[i * V:(i + 1) * V])

    for i in range(NUM_STATES):
        if new_z[i] is None:
            new_z[i] = z[:, i]
    z_out = jnp.stack(new_z, axis=1)
    return [ys[o] for o in range(1, max_order + 1)], z_out
