"""NFC filters vs a sequential port of core/filters/nfc.cpp."""

import numpy as np

import jax.numpy as jnp

from openal_soft_tpu.ops import nfc

f32 = np.float32


def _seq_order(x, consts, cf, order, z):
    """Sequential NfcFilter{1..4}::process on one line (nfc.cpp:225-290)."""
    out = np.empty_like(x)
    if order == 1:
        a0, b1 = cf[0], cf[1]
        a1 = consts.a1_1
        for n, xin in enumerate(x):
            y = xin * a0 - a1 * z[0]
            out[n] = y + b1 * z[0]
            z[0] += y
    elif order == 2:
        a0, b1, b2 = cf[2], cf[3], cf[4]
        a1, a2 = consts.a1_2, consts.a2_2
        for n, xin in enumerate(x):
            y = xin * a0 - a1 * z[1] - a2 * z[2]
            out[n] = y + b1 * z[1] + b2 * z[2]
            z[2] += z[1]
            z[1] += y
    elif order == 3:
        a0, b1, b2, b3 = cf[5], cf[6], cf[7], cf[8]
        a1, a2, a3 = consts.a1_3, consts.a2_3, consts.a3_3
        for n, xin in enumerate(x):
            y0 = xin * a0 - a1 * z[3] - a2 * z[4]
            o0 = y0 + b1 * z[3] + b2 * z[4]
            z[4] += z[3]
            z[3] += y0
            y1 = o0 - a3 * z[5]
            out[n] = y1 + b3 * z[5]
            z[5] += y1
    else:
        a0, b1, b2, b3, b4 = cf[9], cf[10], cf[11], cf[12], cf[13]
        a1, a2, a3, a4 = consts.a1_4, consts.a2_4, consts.a3_4, consts.a4_4
        for n, xin in enumerate(x):
            y0 = xin * a0 - a1 * z[6] - a2 * z[7]
            o0 = y0 + b1 * z[6] + b2 * z[7]
            z[7] += z[6]
            z[6] += y0
            y1 = o0 - a3 * z[8] - a4 * z[9]
            out[n] = y1 + b3 * z[8] + b4 * z[9]
            z[9] += z[8]
            z[8] += y1
    return out


def test_nfc_orders_match_sequential():
    rate = 48000.0
    w1 = float(nfc.SPEED_OF_SOUND / (f32(1.5) * f32(rate)))
    consts = nfc.NfcDeviceConsts(w1)
    rng = np.random.default_rng(0)
    V, T = 4, 256
    w0 = nfc.SPEED_OF_SOUND / (rng.uniform(0.5, 8.0, V).astype(f32) * f32(rate))
    cf = consts.adjust(w0)
    x = rng.standard_normal((V, T)).astype(f32) * 0.5
    z = np.zeros((V, nfc.NUM_STATES), f32)

    # two chained blocks to exercise the state carry
    outs1, z1 = nfc.process_orders(jnp.asarray(x[:, :128]), jnp.asarray(z),
                                   jnp.asarray(cf), consts, 4)
    outs2, z2 = nfc.process_orders(jnp.asarray(x[:, 128:]), z1,
                                   jnp.asarray(cf), consts, 4)
    got = [np.concatenate([np.asarray(a), np.asarray(b)], axis=1)
           for a, b in zip(outs1, outs2)]

    for order in range(1, 5):
        for v in range(V):
            zz = np.zeros(nfc.NUM_STATES, f32)
            want = _seq_order(x[v], consts, cf[v], order, zz)
            np.testing.assert_allclose(got[order - 1][v], want, atol=2e-6,
                                       err_msg=f"order {order} voice {v}")


def test_nfc_identity_passthrough():
    """Create-state (un-adjusted) filters are exact passthrough."""
    consts = nfc.NfcDeviceConsts(0.005)
    rng = np.random.default_rng(1)
    V, T = 2, 128
    x = rng.standard_normal((V, T)).astype(f32)
    cf = consts.identity_coeffs(V)
    outs, _ = nfc.process_orders(jnp.asarray(x), jnp.zeros((V, nfc.NUM_STATES),
                                                           jnp.float32),
                                 jnp.asarray(cf), consts, 4)
    for o, y in enumerate(outs):
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-6,
                                   err_msg=f"order {o + 1}")
