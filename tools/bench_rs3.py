"""Time the gen3 resampler at 4096 voices across super-block widths.

    python tools/bench_rs3.py [sb ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from openal_soft_tpu.ops import tables
from openal_soft_tpu.ops.pallas import resample2 as rs2
from openal_soft_tpu.ops.pallas import resample3 as rs3
from openal_soft_tpu.ops.pallas import resample_unit as ru

L = 4096
BLOCK = 1024
MAX_INC = 131072


def main():
    global NV_OVR
    NV_OVR = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sbs = [int(x) for x in sys.argv[2:]] or [2, 4, 8, 16]
    rng = np.random.default_rng(42)
    taps = 4
    bank_pad = rs2.pad_bank_taps(tables.weight_bank())
    bank_sl = rs3.slice_bank(bank_pad, taps)
    pool = jnp.asarray(rng.standard_normal(1 << 21).astype(np.float32))
    pool2 = rs2.pool_2d(pool)
    src_len = 48000
    offs = np.sort((rng.permutation((1 << 14) - 400)[:48] * 128).astype(np.int64))
    src_off = offs[rng.integers(0, 48, L)].astype(np.int32)
    has_loop = np.ones(L, bool)
    loop_start = np.zeros(L, np.int32)
    loop_end = np.full(L, src_len, np.int32)
    pos_int = rng.integers(0, src_len - 1, L).astype(np.int32)
    active = np.ones(L, bool)
    lay = ru.shared_layout(src_off, np.full(L, src_len), loop_start,
                           loop_end, has_loop, active, taps,
                           pool.size // 128)
    chunks, off_vmem, n256, n64, vrows = lay
    args = dict(
        src_len=jnp.asarray(np.full(L, src_len, np.int32)),
        loop_start=jnp.asarray(loop_start),
        loop_end=jnp.asarray(loop_end),
        has_loop=jnp.asarray(has_loop),
        has_wrapped=jnp.asarray(has_loop),
        pos_int=jnp.asarray(pos_int),
        pos_frac=jnp.asarray(rng.integers(0, 65536, L).astype(np.int32)),
        increment=jnp.asarray(rng.integers(32768, MAX_INC + 1,
                                           L).astype(np.int32)),
        bank_row=jnp.asarray(rng.choice([0, 1, 2, 3], L).astype(np.int32)),
        sf=jnp.zeros(L),
    )
    ov = jnp.asarray(off_vmem)
    ch = jnp.asarray(chunks)

    for sb in sbs:
        T = sb * BLOCK
        vb = rs3.vmem_bytes(T, MAX_INC, taps, vrows, nv=NV_OVR)
        if vb > rs3.VMEM_GATE:
            print(f"sb={sb}: vmem {vb/1e6:.1f} MB > gate, skipped")
            continue

        @jax.jit
        def run(pos_int, pos_frac):
            def body(carry, _):
                pi, pf = carry
                y = rs3.resample_voices_gen_shared(
                    pool2, ov, args["src_len"], args["loop_start"],
                    args["loop_end"], args["has_loop"], args["has_wrapped"],
                    pi, pf, args["increment"], args["bank_row"], args["sf"],
                    bank_sl, ch, n=T, taps=taps, n256=n256, n64=n64,
                    vrows=vrows, max_inc=MAX_INC,
                    active=jnp.asarray(active), nv=NV_OVR)
                tot = pi.astype(jnp.int64) * 65536 + pf + \
                    args["increment"].astype(jnp.int64) * T
                pi2 = (tot // 65536).astype(jnp.int32) % src_len
                pf2 = (tot % 65536).astype(jnp.int32)
                return (pi2, pf2), y[:, -1]
            (pi, pf), ys = jax.lax.scan(
                body, (pos_int, pos_frac), None, length=max(1, 16 // sb))
            return ys

        r = run(args["pos_int"], args["pos_frac"])
        r.block_until_ready()
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            r = run(args["pos_int"], args["pos_frac"])
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        nblocks = max(1, 16 // sb) * sb
        print(f"sb={sb}: {dt/nblocks*1e3:.3f} ms/block "
              f"(scan of {max(1, 16 // sb)} x {T}-windows, vmem {vb/1e6:.1f} MB)",
              flush=True)


if __name__ == "__main__":
    main()
