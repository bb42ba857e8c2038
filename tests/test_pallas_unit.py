"""Unit-increment Pallas resampler vs the jnp reference path (TPU only).

Covers the fast-path eligibility cases: non-looping (incl. leading silence
and end clamp), looping with forward seam inside the block, and the
backward has_wrapped history wrap.
"""

import numpy as np
import pytest

import jax

if jax.default_backend() not in ("tpu", "axon"):
    pytest.skip("Pallas TPU kernel requires TPU hardware", allow_module_level=True)

import jax.numpy as jnp

from openal_soft_tpu.ops import resample as rs_ops, tables
from openal_soft_tpu.ops.pallas import resample_unit as ru


def _run(L, T, taps, seed=0, loop=None, pos_lo=-40, pos_hi=30000,
         src_len=31000, wrapped=None, shared=False, active=None):
    rng = np.random.default_rng(seed)
    bank = tables.weight_bank()
    pool = jnp.asarray(rng.standard_normal(1 << 18).astype(np.float32))
    has_loop = (np.full(L, loop, bool) if loop is not None
                else rng.integers(0, 2, L).astype(bool))
    args = dict(
        src_off=jnp.asarray(rng.integers(64, 1 << 17, L).astype(np.int32)),
        src_len=jnp.asarray(np.full(L, src_len, np.int32)),
        loop_start=jnp.asarray(np.full(L, 100, np.int32)),
        loop_end=jnp.asarray(np.full(L, 30000, np.int32)),
        has_loop=jnp.asarray(has_loop),
        pos_int=jnp.asarray(rng.integers(pos_lo, pos_hi, L).astype(np.int32)),
    )
    pos_frac = rng.integers(0, 65536, L).astype(np.int32)
    bank_row = rng.choice([0, 1, 2, 3], L).astype(np.int32)
    sf = np.zeros(L, np.float32)
    args["has_wrapped"] = (args["has_loop"] if wrapped is None
                           else jnp.asarray(np.full(L, wrapped, bool)))

    w = ru.unit_weights_np(bank, bank_row, sf, pos_frac, taps)
    if shared:
        act = np.ones(L, bool) if active is None else np.asarray(active)
        lay = ru.shared_layout(
            np.asarray(args["src_off"]), np.asarray(args["src_len"]),
            np.asarray(args["loop_start"]), np.asarray(args["loop_end"]),
            np.asarray(args["has_loop"]), act, taps,
            pool.size // 128)
        assert lay is not None
        chunks, off_vmem, n256, n64, vrows = lay
        sargs = dict(args)
        del sargs["src_off"]
        y_unit = ru.resample_voices_unit_shared(
            pool.reshape(-1, 128), jnp.asarray(off_vmem), **sargs,
            weights=jnp.asarray(w), chunks=jnp.asarray(chunks),
            n=T, taps=taps, n256=n256, n64=n64, vrows=vrows,
            active=jnp.asarray(act))
        if active is not None:
            y = np.asarray(y_unit)
            assert np.isfinite(y).all()
            np.testing.assert_array_equal(y[~act], 0.0)
            bank_j = {k: jnp.asarray(v) for k, v in bank.items()}
            y_jnp = rs_ops.resample_voices(
                pool, **args, pos_frac=jnp.asarray(pos_frac),
                increment=jnp.asarray(np.full(L, 1 << 16, np.int32)),
                bank_row=jnp.asarray(bank_row), sf=jnp.asarray(sf),
                bank=bank_j, n=T, taps=taps)
            np.testing.assert_array_equal(y[act], np.asarray(y_jnp)[act])
            return
    else:
        y_unit = ru.resample_voices_unit(
            pool.reshape(-1, 128), **args, weights=jnp.asarray(w),
            n=T, taps=taps)

    bank_j = {k: jnp.asarray(v) for k, v in bank.items()}
    y_jnp = rs_ops.resample_voices(
        pool, **args, pos_frac=jnp.asarray(pos_frac),
        increment=jnp.asarray(np.full(L, 1 << 16, np.int32)),
        bank_row=jnp.asarray(bank_row), sf=jnp.asarray(sf),
        bank=bank_j, n=T, taps=taps)
    np.testing.assert_array_equal(np.asarray(y_unit), np.asarray(y_jnp))


def test_mixed_loop_nonloop():
    _run(64, 1024, 4, seed=0)


def test_seam_and_end_clamp():
    # Positions near loop_end force the forward seam; src_len just past
    # loop_end exercises the non-loop end clamp for the non-looping rows.
    _run(32, 1024, 4, seed=1, pos_lo=28800, pos_hi=29990, src_len=30100)


def test_leading_silence():
    _run(32, 1024, 4, seed=2, loop=False, pos_lo=-1050, pos_hi=5)


def test_bsinc_taps():
    _run(32, 1024, 24, seed=3)


def test_uhj_padded_rows():
    _run(32, 1152, 4, seed=4)


def test_shared_pool_variants():
    # Shared-pool staging (one VMEM image, zero per-voice DMAs) must be
    # bit-identical to the jnp path across the same eligibility cases.
    _run(64, 1024, 4, seed=0, shared=True)
    _run(32, 1024, 4, seed=1, pos_lo=28800, pos_hi=29990, src_len=30100,
         shared=True)
    _run(32, 1024, 4, seed=2, loop=False, pos_lo=-1050, pos_hi=5,
         shared=True)
    _run(32, 1024, 24, seed=3, shared=True)
    _run(32, 1024, 4, seed=5, loop=True, wrapped=False, pos_lo=-40,
         pos_hi=2, shared=True)


def test_shared_pool_inactive_rows():
    # Inactive voices park at the image start (uninitialized VMEM pad
    # rows) with whatever stale geometry the meta carries; their output
    # must be exact zeros — the fused super-block path consumes x_all
    # without an active-mask select, so a NaN here would poison the mix
    # and persist through the HRTF history.
    rng = np.random.default_rng(11)
    act = rng.integers(0, 2, 64).astype(bool)
    act[:2] = [False, True]
    _run(64, 1024, 4, seed=0, shared=True, active=act)
    _run(64, 1024, 4, seed=1, pos_lo=28800, pos_hi=29990, src_len=30100,
         shared=True, active=act)


def test_shared_pool_superblock():
    # A 16-block super-block window through the shared image (the bench
    # composition's window size; exercises the PADMAX headroom).
    _run(32, 16 * 1024, 4, seed=7, loop=True, wrapped=True, src_len=31000,
         shared=True)


def test_looping_prestart():
    # A looping voice that has NOT wrapped yet with pos_int < taps/2-1
    # (delayed start / first block) must emit leading silence, not read
    # the pool samples before the buffer offset: the loop fast path needs
    # the rb >= 0 guard.  The random pool guarantees non-zero data before
    # every buffer offset.
    _run(32, 1024, 4, seed=5, loop=True, wrapped=False, pos_lo=-40,
         pos_hi=2)
    _run(32, 1024, 24, seed=6, loop=True, wrapped=False, pos_lo=-40,
         pos_hi=12)
