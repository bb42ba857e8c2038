"""Time the unit-increment resampler kernel in a 64-iteration scan."""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

SCAN = 64


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

    V, T, taps = 4096, 1024, 4
    rng = np.random.default_rng(0)
    bank = tables.weight_bank()
    pool = jnp.asarray(rng.standard_normal(1 << 21).astype(np.float32))
    src_off = jnp.asarray(rng.integers(64, 1 << 20, V).astype(np.int32))
    src_len = jnp.asarray(np.full(V, 48000, np.int32))
    ls = jnp.asarray(np.full(V, 0, np.int32))
    le = jnp.asarray(np.full(V, 48000, np.int32))
    hl = jnp.asarray(np.ones(V, bool))
    hw = jnp.asarray(np.ones(V, bool))
    pos0 = rng.integers(0, 47000, V).astype(np.int32)
    pos_frac = rng.integers(0, 65536, V).astype(np.int32)
    bank_row = np.full(V, 2, np.int32)
    sf = np.zeros(V, np.float32)
    w = jnp.asarray(ru.unit_weights_np(bank, bank_row, sf, pos_frac, taps))

    @jax.jit
    def empty(x):
        return x + 1.0

    floor = timeit(empty, jnp.zeros((8, 128)))
    print(f"floor {floor:.2f} ms")

    @jax.jit
    def run(pos, pool, w):
        def body(p, _):
            x = ru.resample_voices_unit(pool.reshape(-1, 128), src_off,
                                        src_len, ls, le, hl, hw, p, w, T, taps)
            p2 = p + T
            p2 = jnp.where(p2 >= le, ls + (p2 - ls) % (le - ls), p2)
            return p2, x[0, 0]
        p, xs = jax.lax.scan(body, pos, None, length=SCAN)
        return xs

    total = timeit(run, jnp.asarray(pos0), pool, w)
    print(f"unit kernel: {max(total - floor, 0) / SCAN:.3f} ms/block "
          f"(total {total:.1f})")

    for nv in ():
        @jax.jit
        def run_nv(pos, pool, w, nv=nv):
            def body(p, _):
                x = ru.resample_voices_unit(pool.reshape(-1, 128), src_off,
                                            src_len, ls, le, hl, hw, p, w, T,
                                            taps, nv=nv)
                p2 = p + T
                p2 = jnp.where(p2 >= le, ls + (p2 - ls) % (le - ls), p2)
                return p2, x[0, 0]
            p, xs = jax.lax.scan(body, pos, None, length=SCAN)
            return xs
        total = timeit(run_nv, jnp.asarray(pos0), pool, w)
        print(f"unit kernel nv={nv}: {max(total - floor, 0) / SCAN:.3f} ms/block")


if __name__ == "__main__":
    main()
