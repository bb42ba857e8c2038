"""Isolate ops/pallas/reverb._biquad_chunked against a serial reference."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openal_soft_tpu.ops.pallas import reverb as rp


def kernel(x_ref, z_ref, cf_ref, y_ref, z2_ref):
    y, z2 = rp._biquad_chunked(x_ref[...], z_ref[...], cf_ref[...])
    y_ref[...] = y
    pad = jnp.zeros((rp.NL, rp.LANE - 2), jnp.float32)
    z2_ref[...] = jnp.concatenate([z2, pad], axis=1)


def run_pallas(x, z, cf):
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((rp.NL, rp.CROWS, rp.LANE), jnp.float32),
            jax.ShapeDtypeStruct((rp.NL, rp.LANE), jnp.float32),
        ],
    )(x, z, cf)


def serial_ref(x, z, cf):
    NL, CROWS, LANE = x.shape
    y = np.zeros_like(x).reshape(NL, -1)
    xs = x.reshape(NL, -1)
    z2 = z.copy()
    for l in range(NL):
        b0, b1, b2, a1, a2 = cf[l, :5]
        z0, z1 = z[l]
        for t in range(xs.shape[1]):
            xt = xs[l, t]
            yt = b0 * xt + z0
            z0 = b1 * xt - a1 * yt + z1
            z1 = b2 * xt - a2 * yt
            y[l, t] = yt
        z2[l] = (z0, z1)
    return y.reshape(NL, CROWS, LANE), z2


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((rp.NL, rp.CROWS, rp.LANE)).astype(np.float32)
    z = (0.1 * rng.standard_normal((rp.NL, 2))).astype(np.float32)
    cf = np.zeros((rp.NL, 128), np.float32)
    # realistic biquads: lowpass-ish + shelf-ish + near-passthrough
    coeffs = [
        (0.2929, 0.5858, 0.2929, -0.0000, 0.1716),   # butterworth lp
        (0.9, -1.2, 0.5, -1.3, 0.45),                # resonant
        (1.0, 0.0, 0.0, 0.0, 0.0),                   # passthrough
        (0.7, -0.3, 0.1, -0.8, 0.2),
    ]
    for l, c in enumerate(coeffs):
        cf[l, :5] = c
    y_ref, z2_ref = serial_ref(x, z, cf)
    y, z2 = run_pallas(jnp.asarray(x), jnp.asarray(z), jnp.asarray(cf))
    y = np.asarray(y)
    z2 = np.asarray(z2)[:, :2]
    print("y maxdiff:", np.abs(y - y_ref).max())
    print("z2 maxdiff:", np.abs(z2 - z2_ref).max())
    print("y[0,:8]:", y[0, 0, :8])
    print("ref[0,:8]:", y_ref[0, 0, :8])
    assert np.abs(y - y_ref).max() < 2e-4
    assert np.abs(z2 - z2_ref).max() < 2e-4
    print("OK")


if __name__ == "__main__":
    main()
