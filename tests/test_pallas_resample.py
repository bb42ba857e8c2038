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
