"""Batched device resampler vs the numpy spec oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from openal_soft_tpu.constants import (
    MAX_RESAMPLER_EDGE,
    MIXER_FRAC_ONE,
    Resampler,
)
from openal_soft_tpu.ops import resample, spec, tables

RNG = np.random.default_rng(1234)


def _bank_jnp():
    return {k: jnp.asarray(v) for k, v in tables.weight_bank().items()}


def _run_device(src, pos_int, frac, inc, resampler, n, taps):
    """Resample one voice through the batched kernel (V=1)."""
    pool = jnp.asarray(src.astype(np.float32))
    row, sf = tables.prepare_voice_resampler(resampler, inc, frac)
    out = resample.resample_voices(
        pool,
        src_off=jnp.array([0], jnp.int32),
        src_len=jnp.array([len(src)], jnp.int32),
        loop_start=jnp.array([0], jnp.int32),
        loop_end=jnp.array([len(src)], jnp.int32),
        has_loop=jnp.array([False]),
        has_wrapped=jnp.array([False]),
        pos_int=jnp.array([pos_int], jnp.int32),
        pos_frac=jnp.array([frac], jnp.int32),
        increment=jnp.array([inc], jnp.int32),
        bank_row=jnp.array([row], jnp.int32),
        sf=jnp.array([sf], jnp.float32),
        bank=_bank_jnp(),
        n=n, taps=taps,
    )
    return np.asarray(out[0])


def _spec_padded(src, pos_int):
    """Build the C-style padded span: MaxResamplerEdge zeros + data from pos."""
    # The spec oracle indexes src[MaxResamplerEdge + pos]; emulate a long
    # buffer with edge history of zeros when pos_int==0.
    pad = np.zeros(MAX_RESAMPLER_EDGE, np.float32)
    return np.concatenate([pad, src[pos_int:].astype(np.float32)])


N = 256


@pytest.mark.parametrize("inc,frac", [
    (MIXER_FRAC_ONE, 0),            # 1:1 copy path
    (MIXER_FRAC_ONE // 2, 1000),    # 2x upsample
    (MIXER_FRAC_ONE * 2, 12345),    # 2x downsample
    (47293, 65535),                 # odd ratio
])
@pytest.mark.parametrize("resampler,taps", [
    (Resampler.POINT, 2),
    (Resampler.LINEAR, 2),
    (Resampler.SPLINE, 4),
    (Resampler.GAUSSIAN, 4),
    (Resampler.FAST_BSINC12, 48),
    (Resampler.BSINC12, 24),
    (Resampler.BSINC24, 48),
    (Resampler.BSINC48, 48),
])
def test_matches_spec(resampler, taps, inc, frac):
    src_len = (N * inc + frac) // MIXER_FRAC_ONE + 64
    src = RNG.standard_normal(src_len).astype(np.float32)
    got = _run_device(src, 0, frac, inc, resampler, N, taps)

    padded = _spec_padded(src, 0)
    if inc == MIXER_FRAC_ONE and frac == 0:
        want = spec.resample_point(padded, frac, inc, N)
    elif resampler == Resampler.POINT:
        want = spec.resample_point(padded, frac, inc, N)
    elif resampler == Resampler.LINEAR:
        want = spec.resample_linear(padded, frac, inc, N)
    elif resampler == Resampler.SPLINE:
        want = spec.resample_cubic(tables.spline_table(), padded, frac, inc, N)
    elif resampler == Resampler.GAUSSIAN:
        want = spec.resample_cubic(tables.gaussian_table(), padded, frac, inc, N)
    else:
        tab = tables.bsinc_table_for(resampler)
        fast = resampler in (Resampler.FAST_BSINC12, Resampler.FAST_BSINC24,
                             Resampler.FAST_BSINC48)
        want = spec.resample_bsinc(tab, padded, frac, inc, N, fast=fast)

    # NOTE: the spec oracle reads zeros before sample 0 (edge history), and so
    # does the device kernel (negative positions are silent).
    np.testing.assert_allclose(got, want, atol=4e-6, rtol=1e-6)


def test_loop_wrap():
    """Looping gather must match LoadBufferStatic's wrap behavior."""
    src = RNG.standard_normal(100).astype(np.float32)
    loop_start, loop_end = 20, 90
    inc = MIXER_FRAC_ONE
    pool = jnp.asarray(src)
    out = resample.resample_voices(
        pool,
        src_off=jnp.array([0], jnp.int32),
        src_len=jnp.array([100], jnp.int32),
        loop_start=jnp.array([loop_start], jnp.int32),
        loop_end=jnp.array([loop_end], jnp.int32),
        has_loop=jnp.array([True]),
        has_wrapped=jnp.array([False]),
        pos_int=jnp.array([50], jnp.int32),
        pos_frac=jnp.array([0], jnp.int32),
        increment=jnp.array([inc], jnp.int32),
        bank_row=jnp.array([0], jnp.int32),
        sf=jnp.array([0.0], jnp.float32),
        bank=_bank_jnp(),
        n=N, taps=2,
    )
    out = np.asarray(out[0])
    want = np.empty(N, np.float32)
    loop = src[loop_start:loop_end]
    for i in range(N):
        p = 50 + i
        want[i] = src[p] if p < loop_end else loop[(p - loop_start) % len(loop)]
    np.testing.assert_array_equal(out, want)


def test_end_clamp_and_silence():
    """Non-looping: clamp to last sample; negative positions silent."""
    src = RNG.standard_normal(40).astype(np.float32)
    pool = jnp.asarray(src)
    out = resample.resample_voices(
        pool,
        src_off=jnp.array([0], jnp.int32),
        src_len=jnp.array([40], jnp.int32),
        loop_start=jnp.array([0], jnp.int32),
        loop_end=jnp.array([40], jnp.int32),
        has_loop=jnp.array([False]),
        has_wrapped=jnp.array([False]),
        pos_int=jnp.array([-8], jnp.int32),
        pos_frac=jnp.array([0], jnp.int32),
        increment=jnp.array([MIXER_FRAC_ONE], jnp.int32),
        bank_row=jnp.array([0], jnp.int32),
        sf=jnp.array([0.0], jnp.float32),
        bank=_bank_jnp(),
        n=64, taps=2,
    )
    out = np.asarray(out[0])
    np.testing.assert_array_equal(out[:8], 0.0)
    np.testing.assert_array_equal(out[8:48], src)
    np.testing.assert_array_equal(out[48:], src[-1])


def test_advance_positions():
    pi, pf = resample.advance_positions(
        jnp.array([10], jnp.int32), jnp.array([60000], jnp.int32),
        jnp.array([70000], jnp.int32), jnp.array([100], jnp.int32))
    total = 60000 + 70000 * 100
    assert int(pi[0]) == 10 + (total >> 16)
    assert int(pf[0]) == total & 0xFFFF
