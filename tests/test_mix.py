"""Batched gain-ramped mix vs the MixLine spec oracle."""

import numpy as np

import jax.numpy as jnp

from openal_soft_tpu.ops import mix, spec

RNG = np.random.default_rng(99)


def _run_both(V, C, T, counter_val, cur, tgt, fade=64):
    x = RNG.standard_normal((V, T)).astype(np.float32)
    counter = np.full(V, counter_val, np.int32)

    out, new_cur = mix.mix_voices(jnp.asarray(x), jnp.asarray(cur), jnp.asarray(tgt),
                                  jnp.asarray(counter), fade)
    out = np.asarray(out)
    new_cur = np.asarray(new_cur)

    want = np.zeros((C, T), np.float32)
    want_cur = cur.copy()
    for v in range(V):
        spec.mix(x[v], want, want_cur[v], tgt[v], counter_val, 0)
    return out, new_cur, want, want_cur


def test_no_fade():
    V, C, T = 7, 4, 256
    cur = RNG.standard_normal((V, C)).astype(np.float32)
    tgt = cur.copy()  # no fade when counter==0: target applied directly
    out, new_cur, want, want_cur = _run_both(V, C, T, 0, cur, tgt)
    np.testing.assert_allclose(out, want, atol=1e-5)
    np.testing.assert_array_equal(new_cur, want_cur)


def test_fade_64():
    V, C, T = 5, 3, 256
    cur = RNG.standard_normal((V, C)).astype(np.float32)
    tgt = RNG.standard_normal((V, C)).astype(np.float32)
    out, new_cur, want, want_cur = _run_both(V, C, T, 64, cur, tgt)
    np.testing.assert_allclose(out, want, atol=2e-5)
    np.testing.assert_array_equal(new_cur, want_cur)


def test_silence_threshold_skip():
    """Targets below -100 dB must contribute nothing after the fade."""
    V, C, T = 2, 2, 128
    cur = np.full((V, C), 0.5, np.float32)
    tgt = np.full((V, C), 5e-6, np.float32)  # below GainSilenceThreshold
    out, new_cur, want, want_cur = _run_both(V, C, T, 64, cur, tgt)
    np.testing.assert_allclose(out, want, atol=2e-5)
    # After the fade the tail is exactly zero.
    np.testing.assert_array_equal(out[:, 64:], 0.0)
    np.testing.assert_array_equal(new_cur, want_cur)


def test_tiny_step_applies_target_immediately():
    """|step| <= eps → no ramp, target gain from sample 0 (MixLine branch)."""
    V, C, T = 1, 1, 128
    cur = np.full((V, C), 0.25, np.float32)
    tgt = cur + np.float32(1e-9)
    out, new_cur, want, want_cur = _run_both(V, C, T, 64, cur, tgt)
    np.testing.assert_allclose(out, want, atol=1e-6)
    np.testing.assert_array_equal(new_cur, want_cur)


def test_grouped_routing():
    V, C, T, G = 6, 2, 192, 3
    x = RNG.standard_normal((V, T)).astype(np.float32)
    cur = RNG.standard_normal((V, C)).astype(np.float32)
    tgt = RNG.standard_normal((V, C)).astype(np.float32)
    counter = np.zeros(V, np.int32)
    group = np.array([0, 1, 2, 0, 1, 2], np.int32)

    out, _ = mix.mix_voices_grouped(jnp.asarray(x), jnp.asarray(cur), jnp.asarray(tgt),
                                    jnp.asarray(counter), jnp.asarray(group), G, 64)
    out = np.asarray(out)

    for g in range(G):
        want = np.zeros((C, T), np.float32)
        cur_g = cur.copy()
        for v in np.where(group == g)[0]:
            spec.mix(x[v], want, cur_g[v], tgt[v], 0, 0)
        np.testing.assert_allclose(out[g], want, atol=2e-5)
