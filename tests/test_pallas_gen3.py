"""Gen3 shared-pool general resampler vs the jnp reference — bit-exact.

Covers the merged-slice construction (loop seam, wrap, end clamp,
pre-start silence), the one-hot MXU window assembly, super-block windows,
the UHJ pad geometry, bsinc48 taps, inactive-row parking, and the 10x
pitch bucket.  The standalone sweep lives in tools/t_rs3.py; these are
the load-bearing cases at CI scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openal_soft_tpu.ops import resample as rs_ops, tables
from openal_soft_tpu.ops.pallas import resample2 as rs2
from openal_soft_tpu.ops.pallas import resample3 as rs3
from openal_soft_tpu.ops.pallas import resample_unit as ru

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel")


def _case(L, T, taps, seed, max_inc, loop_frac=0.5, src_len=48000,
          active_frac=1.0, pool_bits=20, n_bufs=16):
    rng = np.random.default_rng(seed)
    bank = {k: jnp.asarray(v) for k, v in tables.weight_bank().items()}
    bank_sl = rs3.slice_bank(rs2.pad_bank_taps(tables.weight_bank()), taps)
    pool = jnp.asarray(rng.standard_normal(1 << pool_bits).astype(np.float32))
    pool2 = rs2.pool_2d(pool)
    offs = np.sort((rng.permutation((1 << (pool_bits - 7)) - 400)[:n_bufs]
                    * 128).astype(np.int64))
    src_off = offs[rng.integers(0, n_bufs, L)].astype(np.int32)
    has_loop = rng.random(L) < loop_frac
    wspan = ((65535 + (T - 1) * max_inc) >> 16) + taps + 2
    loop_start = rng.integers(0, 200, L).astype(np.int32)
    loop_end = np.minimum(
        loop_start + rng.integers(wspan, src_len - 256, L), src_len
    ).astype(np.int32)
    pos_int = rng.integers(-40, src_len - 100, L).astype(np.int32)
    pos_loop = (loop_start + rng.integers(0, 1 << 20, L)
                % np.maximum(loop_end - loop_start, 1)).astype(np.int32)
    pos_int = np.where(has_loop, pos_loop, pos_int)
    active = rng.random(L) < active_frac
    args = dict(
        src_off=jnp.asarray(src_off),
        src_len=jnp.asarray(np.full(L, src_len, np.int32)),
        loop_start=jnp.asarray(loop_start),
        loop_end=jnp.asarray(loop_end),
        has_loop=jnp.asarray(has_loop),
        has_wrapped=jnp.asarray(has_loop & (rng.random(L) < 0.5)),
        pos_int=jnp.asarray(pos_int),
        pos_frac=jnp.asarray(rng.integers(0, 65536, L).astype(np.int32)),
        increment=jnp.asarray(rng.integers(
            max(1000, max_inc // 4), max_inc + 1, L).astype(np.int32)),
        bank_row=jnp.asarray(rng.choice([0, 1, 2, 3], L).astype(np.int32)),
        sf=jnp.zeros(L),
    )
    lay = ru.shared_layout(src_off, np.full(L, src_len), loop_start,
                           loop_end, has_loop, active, taps,
                           pool.size // 128)
    assert lay is not None
    chunks, off_vmem, n256, n64, vrows = lay
    y3 = rs3.resample_voices_gen_shared(
        pool2, jnp.asarray(off_vmem), args["src_len"], args["loop_start"],
        args["loop_end"], args["has_loop"], args["has_wrapped"],
        args["pos_int"], args["pos_frac"], args["increment"],
        args["bank_row"], args["sf"], bank_sl, jnp.asarray(chunks),
        n=T, taps=taps, n256=n256, n64=n64, vrows=vrows, max_inc=max_inc,
        active=jnp.asarray(active))
    y_jnp = rs_ops.resample_voices(pool, **args, bank=bank, n=T, taps=taps)
    a3, aj = np.asarray(y3), np.asarray(y_jnp)
    assert np.isfinite(a3).all()
    if active_frac < 1.0:
        np.testing.assert_array_equal(a3[~active], 0.0)
        np.testing.assert_array_equal(a3[active], aj[active])
    else:
        np.testing.assert_array_equal(a3, aj)


def test_gen3_mixed_pitch_block():
    _case(32, 1024, 4, 0, 131072)


def test_gen3_all_looping_uhj_pad():
    _case(32, 1152, 4, 1, 131072, loop_frac=1.0)


def test_gen3_superblock_window():
    _case(32, 4096, 4, 2, 131072)


def test_gen3_high_pitch_bucket():
    _case(32, 1024, 4, 3, 655360, src_len=60000)


def test_gen3_bsinc48_inactive_rows():
    _case(32, 1024, 48, 4, 131072, src_len=30000, pool_bits=19,
          n_bufs=8, active_frac=0.6)
