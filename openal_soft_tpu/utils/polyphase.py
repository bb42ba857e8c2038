"""Offline Kaiser-windowed sinc resampler (common/polyphase_resampler.cpp).

Used where the reference uses PPhaseResampler: resampling whole HRTF sets
and convolution-reverb impulse responses to the device rate.  Quality
parameters match the reference (epsilon 1e-4 rejection design).
"""

from __future__ import annotations

import math

import numpy as np


def _kaiser_beta(rejection_db: float) -> float:
    if rejection_db > 50.0:
        return 0.1102 * (rejection_db - 8.7)
    if rejection_db >= 21.0:
        return 0.5842 * (rejection_db - 21.0) ** 0.4 + 0.07886 * (rejection_db - 21.0)
    return 0.0


def polyphase_resample(x: np.ndarray, rate_in: int, rate_out: int,
                       rejection_db: float = 180.0) -> np.ndarray:
    """Resample a 1-D float array from rate_in to rate_out (f64)."""
    if rate_in == rate_out:
        return np.asarray(x, np.float64)
    g = math.gcd(rate_in, rate_out)
    p, q = rate_out // g, rate_in // g          # upsample p, downsample q
    beta = _kaiser_beta(rejection_db)
    cutoff = 0.475 / max(p, q)
    # Transition width sets the filter order.
    width = 0.05 / max(p, q)
    order = int(np.ceil((rejection_db - 7.95) / (2.285 * 2 * np.pi * width)))
    order += order & 1  # even
    n = np.arange(-order // 2, order // 2 + 1, dtype=np.float64)
    h = 2.0 * cutoff * np.sinc(2.0 * cutoff * n)
    h *= np.i0(beta * np.sqrt(np.maximum(1.0 - (2.0 * n / order) ** 2, 0.0))) / np.i0(beta)
    h *= p

    up = np.zeros(len(x) * p, np.float64)
    up[::p] = np.asarray(x, np.float64)
    y = np.convolve(up, h, mode="same")
    out_len = int(np.ceil(len(x) * rate_out / rate_in))
    return y[::q][:out_len]
