"""Table-generation invariants (vs core/cubic_tables.cpp, core/bsinc_tables.cpp)."""

import numpy as np
import pytest

from openal_soft_tpu.constants import MIXER_FRAC_ONE, Resampler
from openal_soft_tpu.ops import tables


def test_gaussian_normalized():
    coeffs, deltas = tables.gaussian_table()
    assert coeffs.shape == (32, 4)
    # Rows are normalized to unit DC gain by construction.
    np.testing.assert_allclose(coeffs.sum(axis=1), 1.0, atol=2e-7)
    # Phase 0 is symmetric-peaked: center tap dominates.
    assert coeffs[0, 1] > 0.5
    assert np.argmax(coeffs[0]) == 1


def test_gaussian_delta_wraparound():
    coeffs, deltas = tables.gaussian_table()
    np.testing.assert_array_equal(deltas[:-1], coeffs[1:] - coeffs[:-1])
    # Last phase wraps to phase 0 shifted one tap (cubic_tables.cpp:67-71).
    assert deltas[-1, 0] == np.float32(0.0 - coeffs[-1, 0])
    assert deltas[-1, 1] == np.float32(coeffs[0, 0] - coeffs[-1, 1])


def test_spline_is_catmull_rom():
    coeffs, _ = tables.spline_table()
    # mu = 0 → identity tap.
    np.testing.assert_array_equal(coeffs[0], [0.0, 1.0, 0.0, 0.0])
    # Partition of unity for all phases.
    np.testing.assert_allclose(coeffs.sum(axis=1), 1.0, atol=2e-7)


@pytest.mark.parametrize("name,order,points", [
    ("bsinc12", 11, 12), ("bsinc24", 23, 24), ("bsinc48", 47, 48)])
def test_bsinc_geometry(name, order, points):
    tab = getattr(tables, name)()
    # Largest (most downsampling) scale has the most points; scale index 15
    # (no downsampling) has the nominal point count.
    assert int(tab.m[-1]) == points
    assert int(tab.m[0]) >= points
    assert all(m % 4 == 0 for m in tab.m)
    assert tab.flat.size == int(np.sum(4 * 32 * tab.m))
    # Unit-ish DC response at scale 15, phase 0.
    dc = tab.fil[-1, 0].sum()
    assert 0.95 < dc < 1.05


def test_bsinc_prepare_limits():
    tab = tables.bsinc24()
    # No downsampling → last scale, sf 0.
    assert tables.bsinc_prepare(tab, MIXER_FRAC_ONE) == (15, 0.0)
    assert tables.bsinc_prepare(tab, MIXER_FRAC_ONE // 2) == (15, 0.0)
    # Heavy downsampling saturates at scale 0.
    si, sf = tables.bsinc_prepare(tab, MIXER_FRAC_ONE * 10)
    assert si == 0
    # sf stays within [0, 1).
    for inc in range(MIXER_FRAC_ONE + 1, MIXER_FRAC_ONE * 10, 12345):
        si, sf = tables.bsinc_prepare(tab, inc)
        assert 0 <= si < 16
        assert 0.0 <= sf < 1.0


def test_prepare_voice_resampler_copy_path():
    # 1:1 rate with zero phase short-circuits to point (= direct copy).
    row, sf = tables.prepare_voice_resampler(Resampler.BSINC48, MIXER_FRAC_ONE, 0)
    assert row == 0 and sf == 0.0
    row2, _ = tables.prepare_voice_resampler(Resampler.BSINC48, MIXER_FRAC_ONE + 1, 0)
    assert row2 >= 4


def test_weight_bank_shapes():
    bank = tables.weight_bank()
    for k in ("fil", "phd", "scd", "spd"):
        assert bank[k].shape == (tables.N_BANK_ROWS, 32, 48)
    # point row: single unit weight at the window center.
    assert bank["fil"][0, 0, 23] == 1.0
    assert bank["fil"][0].sum() == 32.0
    # non-bsinc rows carry no scale deltas.
    assert np.all(bank["scd"][:4] == 0.0)
