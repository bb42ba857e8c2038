"""A/B the unit resampler: per-voice span DMAs vs shared-pool staging.

Scene mirrors bench.py's best_case composition: 4096 voices over 48 shared
1-second looping buffers, resampled in 16-block (16384-sample) super-block
windows — the configuration where per-voice DMAs duplicate each buffer's
rows ~85x per call.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

SCAN = 16


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    from openal_soft_tpu.ops import tables
    from openal_soft_tpu.ops.pallas import resample_unit as ru

    V, T, taps, NB = 4096, 1024, 4, 16
    W = NB * T
    BUFS, BLEN = 48, 48000
    rng = np.random.default_rng(0)
    bank = tables.weight_bank()
    pool_np = rng.standard_normal(1 << 22).astype(np.float32)
    pool = jnp.asarray(pool_np)
    offs = (64 + np.arange(BUFS) * (BLEN + 160)).astype(np.int64)
    src_off_np = offs[np.arange(V) % BUFS].astype(np.int32)
    src_off = jnp.asarray(src_off_np)
    src_len_np = np.full(V, BLEN, np.int32)
    src_len = jnp.asarray(src_len_np)
    ls = jnp.asarray(np.zeros(V, np.int32))
    le = jnp.asarray(src_len_np)
    hl = jnp.asarray(np.ones(V, bool))
    hw = jnp.asarray(np.ones(V, bool))
    pos0 = (np.zeros(V) if __import__('os').environ.get('SYNC') else rng.integers(0, BLEN - 1, V)).astype(np.int32)
    pos_frac = rng.integers(0, 65536, V).astype(np.int32)
    bank_row = np.full(V, 2, np.int32)
    sf = np.zeros(V, np.float32)
    w = jnp.asarray(ru.unit_weights_np(bank, bank_row, sf, pos_frac, taps))

    lay = ru.shared_layout(src_off_np, src_len_np, np.zeros(V, np.int64),
                           src_len_np, np.ones(V, bool), np.ones(V, bool),
                           taps, pool_np.size // 128)
    assert lay is not None
    chunks_np, offv_np, n256, n64, vrows = lay
    chunks = jnp.asarray(chunks_np)
    offv = jnp.asarray(offv_np)
    print(f"layout: n256={n256} ({chunks_np[0]} real) n64={n64} "
          f"({chunks_np[1]} real) vrows={vrows}")

    @jax.jit
    def empty(x):
        return x + 1.0

    floor = timeit(empty, jnp.zeros((8, 128)))
    print(f"floor {floor:.2f} ms")

    def step_pos(p):
        p2 = p + W
        return jnp.where(p2 >= le, ls + (p2 - ls) % (le - ls), p2)

    @jax.jit
    def run_pervoice(pos, pool, w):
        def body(p, _):
            x = ru.resample_voices_unit(pool.reshape(-1, 128), src_off,
                                        src_len, ls, le, hl, hw, p, w, W,
                                        taps)
            return step_pos(p), x[0, 0]
        p, xs = jax.lax.scan(body, pos, None, length=SCAN)
        return xs

    @jax.jit
    def run_shared(pos, pool, w, chunks, offv):
        def body(p, _):
            x = ru.resample_voices_unit_shared(
                pool.reshape(-1, 128), offv, src_len, ls, le, hl, hw, p, w,
                chunks, W, taps, n256=n256, n64=n64, vrows=vrows)
            return step_pos(p), x[0, 0]
        p, xs = jax.lax.scan(body, pos, None, length=SCAN)
        return xs

    pv = timeit(run_pervoice, jnp.asarray(pos0), pool, w)
    print(f"per-voice DMA: {max(pv - floor, 0) / SCAN / NB:.4f} ms/block "
          f"({max(pv - floor, 0) / SCAN:.3f} ms/super-block)")
    sh = timeit(run_shared, jnp.asarray(pos0), pool, w, chunks, offv)
    print(f"shared pool:   {max(sh - floor, 0) / SCAN / NB:.4f} ms/block "
          f"({max(sh - floor, 0) / SCAN:.3f} ms/super-block)")

    # correctness spot-check (first super-block, vs each other)
    x1 = ru.resample_voices_unit(pool.reshape(-1, 128), src_off, src_len,
                                 ls, le, hl, hw, jnp.asarray(pos0), w, W,
                                 taps)
    x2 = ru.resample_voices_unit_shared(
        pool.reshape(-1, 128), offv, src_len, ls, le, hl, hw,
        jnp.asarray(pos0), w, chunks, W, taps, n256=n256, n64=n64,
        vrows=vrows)
    dev = float(jnp.abs(x1 - x2).max())
    print(f"max |per-voice - shared| = {dev:.3e}")


if __name__ == "__main__":
    main()
