"""Pallas resampler vs the jnp reference path (runs on real TPU only)."""

import numpy as np
import pytest

import jax

if jax.default_backend() not in ("tpu", "axon"):
    pytest.skip("Pallas TPU kernel requires TPU hardware", allow_module_level=True)

import jax.numpy as jnp

from openal_soft_tpu.ops import resample as rs_ops, tables
from openal_soft_tpu.ops.pallas import resample as prs


def test_matches_jnp_path():
    L, T, taps = 64, 1024, 4
    rng = np.random.default_rng(0)
    bank = {k: jnp.asarray(v) for k, v in tables.weight_bank().items()}
    bank_pad = prs.pad_bank(tables.weight_bank())
    pool = jnp.asarray(rng.standard_normal(1 << 20).astype(np.float32))
    args = dict(
        src_off=jnp.asarray(rng.integers(64, 1 << 19, L).astype(np.int32)),
        src_len=jnp.asarray(np.full(L, 48000, np.int32)),
        loop_start=jnp.asarray(np.full(L, 100, np.int32)),
        loop_end=jnp.asarray(np.full(L, 40000, np.int32)),
        has_loop=jnp.asarray(rng.integers(0, 2, L).astype(bool)),
        pos_int=jnp.asarray(rng.integers(-50, 30000, L).astype(np.int32)),
        pos_frac=jnp.asarray(rng.integers(0, 65536, L).astype(np.int32)),
        increment=jnp.asarray(rng.integers(30000, 131072, L).astype(np.int32)),
        bank_row=jnp.asarray(rng.choice([0, 1, 2, 3], L).astype(np.int32)),
        sf=jnp.zeros(L),
    )
    args["has_wrapped"] = args["has_loop"]
    span = prs.span_for_increment(131072, T)
    y_pallas = prs.resample_voices_pallas(pool, **args, bank_pad=bank_pad,
                                          n=T, taps=taps, span=span)
    y_jnp = rs_ops.resample_voices(pool, **args, bank=bank, n=T, taps=taps)
    np.testing.assert_array_equal(np.asarray(y_pallas), np.asarray(y_jnp))


def test_v2_matches_jnp_nonpow2_rows():
    """v2 kernel with a UHJ-padded block (T=1152 -> 9 rows per voice): the
    within-voice row index must not assume a power-of-two row count, and
    loop wraps must resolve identically to the jnp path."""
    from openal_soft_tpu.ops.pallas import resample2 as prs2

    V, taps = 8, 4
    rng = np.random.default_rng(3)
    bank = {k: jnp.asarray(v) for k, v in tables.weight_bank().items()}
    bank_pad = prs2.pad_bank_taps(tables.weight_bank())
    pool = jnp.asarray(rng.standard_normal(1 << 16).astype(np.float32))
    pool2 = prs2.pool_2d(pool)
    loop_len = 12000
    for T in (1152, 1024):
        for pos in (11264, 11999, 0, 288):
            args = dict(
                src_off=jnp.full(V, 8, jnp.int32),
                src_len=jnp.full(V, loop_len, jnp.int32),
                loop_start=jnp.zeros(V, jnp.int32),
                loop_end=jnp.full(V, loop_len, jnp.int32),
                has_loop=jnp.ones(V, bool),
                has_wrapped=jnp.full(V, pos < 1000, bool),
                pos_int=jnp.full(V, pos, jnp.int32),
                pos_frac=jnp.asarray(rng.integers(0, 65536, V).astype(np.int32)),
                increment=jnp.asarray(
                    rng.integers(30000, 131072, V).astype(np.int32)),
                bank_row=jnp.zeros(V, jnp.int32),
                sf=jnp.zeros(V),
            )
            winw = prs2.winw_for(131072, taps)
            span = prs2.span_for_increment(131072, T, winw)
            y2 = prs2.resample_voices_pallas2(pool2, **args, bank_pad=bank_pad,
                                              n=T, taps=taps, span=span,
                                              winw=winw)
            y_jnp = rs_ops.resample_voices(pool, **args, bank=bank, n=T,
                                           taps=taps)
            np.testing.assert_array_equal(np.asarray(y2), np.asarray(y_jnp))
