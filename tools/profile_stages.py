"""Stage-level timing of the flagship 4096-voice HRTF block graph.

The axon tunnel imposes a ~29 ms dispatch round-trip floor, so each stage
is timed inside a 64-iteration lax.scan within one dispatch; the floor
(empty-graph dispatch) is subtracted and the remainder divided by the scan
length.  Not part of the test suite.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

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


def scan_stage(stage):
    """Wrap a carry-threading stage fn into a SCAN-iteration jitted loop."""
    @jax.jit
    def run(*args):
        def body(carry, _):
            return stage(carry, *args[1:]), None
        out, _ = jax.lax.scan(body, args[0], None, length=SCAN)
        return out
    return run


def main():
    from openal_soft_tpu.alc.device import LoopbackDevice
    from openal_soft_tpu.ops import hrtf_mix, mix as mix_ops
    from openal_soft_tpu.ops.pallas import resample2 as rs_pallas

    n_voices = 4096
    sample_rate = 48000
    block = 1024

    dev = LoopbackDevice(frequency=sample_rate, channels="stereo",
                         sample_type="float32", capacity=n_voices, hrtf=True)
    ctx = dev.create_context()
    rng = np.random.default_rng(42)
    t = np.arange(sample_rate) / sample_rate
    bufs = []
    for fi in range(48):
        freq = 110.0 * (2.0 ** (fi / 12.0))
        tone = (0.1 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        buf = ctx.create_buffer()
        buf.set_data(tone, "mono", "float32", sample_rate)
        bufs.append(buf)
    for i in range(n_voices):
        src = ctx.create_source()
        src.buffer(bufs[i % 48])
        src.looping = True
        src.set("position", tuple(rng.standard_normal(3) * 3.0))
        src.play()
    dev.render_samples(block)   # builds cfg/ev
    dev.render_samples(block)   # cfg is rebuilt once the reset mask drains

    d = dev
    state = dict(d._state)
    ev = d._ev_dev if d._ev_dev is not None else d.table.evolving_dict()
    cfg = d._cfg_dev
    pool = d.pool.device_array()
    T = block
    taps = d._taps
    rs_plan = d._rs_plan(T)
    print(f"rs_plan={rs_plan} taps={taps} n_dry={d.n_dry} slots={len(d.slots)}")

    # Floor: an empty dispatch (tiny add, same I/O pattern).
    @jax.jit
    def empty(x):
        return x + 1.0

    floor = timeit(empty, jnp.zeros((8, 128)))
    print(f"dispatch floor:        {floor:8.3f} ms")

    def report(name, run, *args):
        total = timeit(run, *args)
        print(f"{name:22s} {max(total - floor, 0.0) / SCAN:8.3f} ms/block"
              f"   (scan total {total:7.1f} ms)")

    # --- stage: resample (pallas) ---
    if rs_plan[0] == "unit":
        from openal_soft_tpu.ops.pallas import resample_unit as rs_unit

        def st_resample(carry, cfg, pool):
            x = rs_unit.resample_voices_unit(
                pool.reshape(-1, 128), cfg["src_off"], cfg["src_len"],
                cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                carry["has_wrapped"], carry["pos_int"], cfg["rs_unit_w"],
                T, taps)
            c = dict(carry)
            c["acc"] = carry["acc"] + x[:, :8].sum()
            return c

        carry0 = {"has_wrapped": ev["has_wrapped"], "pos_int": ev["pos_int"],
                  "acc": jnp.float32(0)}
        report("resample(unit):", scan_stage(st_resample), carry0, cfg, pool)

        @jax.jit
        def one_x(ev, cfg, pool):
            return rs_unit.resample_voices_unit(
                pool.reshape(-1, 128), cfg["src_off"], cfg["src_len"],
                cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                ev["has_wrapped"], ev["pos_int"], cfg["rs_unit_w"],
                T, taps)
    else:
        span, winw = rs_plan[1], rs_plan[2]

        def st_resample(carry, cfg, pool):
            x = rs_pallas.resample_voices_pallas2(
                pool.reshape(-1, 128), cfg["src_off"], cfg["src_len"],
                cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                carry["has_wrapped"], carry["pos_int"], carry["pos_frac"],
                cfg["increment"], cfg["bank_row"], cfg["sf"],
                d._bank_pad, T, taps, span, winw)
            c = dict(carry)
            c["acc"] = carry["acc"] + x[:, :8].sum()
            return c

        carry0 = {"has_wrapped": ev["has_wrapped"], "pos_int": ev["pos_int"],
                  "pos_frac": ev["pos_frac"], "acc": jnp.float32(0)}
        report("resample(pallas):", scan_stage(st_resample), carry0, cfg, pool)

        @jax.jit
        def one_x(ev, cfg, pool):
            return rs_pallas.resample_voices_pallas2(
                pool.reshape(-1, 128), cfg["src_off"], cfg["src_len"],
                cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                ev["has_wrapped"], ev["pos_int"], ev["pos_frac"],
                cfg["increment"], cfg["bank_row"], cfg["sf"],
                d._bank_pad, T, taps, span, winw)

    x = one_x(ev, cfg, pool)

    # --- stage: biquad ---
    def st_biquad(carry, x, ev, cfg):
        y, z2, cf2, cnt2 = d._biquad(x + carry["acc"], carry["z"],
                                     carry["cf"], cfg["filter_target"],
                                     ev["filter_counter"], T)
        return {"z": z2, "cf": cf2, "acc": y[:1, :1].sum() * 1e-30}

    report("biquad:", scan_stage(st_biquad),
           {"z": state["filter_z"], "cf": ev["filter_coeffs"],
            "acc": jnp.float32(0)}, x, ev, cfg)

    # --- stage: dry mix ---
    def st_mix(carry, x, ev, cfg):
        dry_tgt = jnp.where(cfg["playing"][:, None], cfg["dry_tgt"], 0.0)
        dry, cur2 = mix_ops.mix_voices(x + carry["acc"], carry["cur"],
                                       dry_tgt, ev["fade"], 64)
        return {"cur": cur2, "acc": dry[:1, :1].sum() * 1e-30}

    report("dry mix:", scan_stage(st_mix),
           {"cur": ev["dry_cur"], "acc": jnp.float32(0)}, x, ev, cfg)

    # --- stage: hrtf accumulate (matmul + skew) ---
    def st_hrtf(carry, x, ev, cfg):
        x_cat = jnp.concatenate([carry["hist"], x + carry["acc"]], axis=1)
        g_eff = jnp.where(cfg["playing"], cfg["hrtf_gain"], 0.0)
        y_ext = hrtf_mix.hrtf_voices_accum(
            x_cat, cfg["hrtf_coeffs"], cfg["hrtf_delay"], g_eff,
            cfg["hrtf_old_coeffs"], cfg["hrtf_old_delay"],
            cfg["hrtf_old_gain"], ev["fade"], cfg["active"], T, 64)
        return {"hist": x_cat[:, T:], "acc": y_ext[:1, :1].sum() * 1e-30}

    report("hrtf accum (matmul):", scan_stage(st_hrtf),
           {"hist": state["hrtf_history"], "acc": jnp.float32(0)}, x, ev, cfg)

    # --- full block ---
    def st_block(carry, cfg, pool):
        out, st2, ev2 = d._render_one(carry["state"], carry["ev"], cfg, pool,
                                      T, taps, rs_plan)
        return {"state": st2, "ev": ev2}

    report("full block:", scan_stage(st_block),
           {"state": state, "ev": ev}, cfg, pool)

    # --- render_samples measured end to end ---
    for _ in range(3):
        dev.render_samples(block)
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        dev.render_samples(block)
        ts.append(time.perf_counter() - t0)
    print(f"render_samples(1024):  {float(np.median(ts) * 1e3):8.3f} ms"
          f"  (p99 {float(np.percentile(ts, 99) * 1e3):.3f})")
    for horizon in (64, 512):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            dev.render_samples(horizon * block)
            ts.append((time.perf_counter() - t0) / horizon)
        ms = float(np.median(ts) * 1e3)
        print(f"render_samples({horizon:3d}x):  {ms:8.3f} ms/block"
              f"  -> {21.333 / ms:.1f}x realtime")


if __name__ == "__main__":
    main()
