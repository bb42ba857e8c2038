"""Incremental-composition profiling: find where the full block's time goes.

Builds successively larger prefixes of RenderDevice._render_one inside a
64-iteration scan and reports the marginal cost of each addition.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

SCAN = 64


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def scan_stage(stage):
    @jax.jit
    def run(*args):
        def body(carry, _):
            return stage(carry, *args[1:]), None
        out, _ = jax.lax.scan(body, args[0], None, length=SCAN)
        return out
    return run


def main():
    from openal_soft_tpu.alc.device import LoopbackDevice
    from openal_soft_tpu.ops import hrtf_mix, mix as mix_ops, resample as rs_ops
    from openal_soft_tpu.ops.pallas import resample2 as rs_pallas

    n_voices, sample_rate, block = 4096, 48000, 1024
    dev = LoopbackDevice(frequency=sample_rate, channels="stereo",
                         sample_type="float32", capacity=n_voices, hrtf=True)
    ctx = dev.create_context()
    rng = np.random.default_rng(42)
    t = np.arange(sample_rate) / sample_rate
    bufs = []
    for fi in range(48):
        tone = (0.1 * np.sin(2 * np.pi * 110.0 * 2 ** (fi / 12) * t)).astype(np.float32)
        buf = ctx.create_buffer()
        buf.set_data(tone, "mono", "float32", sample_rate)
        bufs.append(buf)
    for i in range(n_voices):
        src = ctx.create_source()
        src.buffer(bufs[i % 48])
        src.looping = True
        src.set("position", tuple(rng.standard_normal(3) * 3.0))
        src.play()
    dev.render_samples(block)
    dev.render_samples(block)

    d = dev
    state = dict(d._state)
    ev = d._ev_dev if d._ev_dev is not None else d.table.evolving_dict()
    cfg = d._cfg_dev
    pool = d.pool.device_array()
    T = block
    taps = d._taps
    rs_plan = d._rs_plan(T)
    span, winw = (rs_plan[1], rs_plan[2]) if rs_plan[0] == "gen" else (0, 0)
    fade = 64

    @jax.jit
    def empty(x):
        return x + 1.0

    floor = timeit(empty, jnp.zeros((8, 128)))
    print(f"floor {floor:.2f} ms")

    def report(name, run, *args):
        total = timeit(run, *args)
        print(f"{name:28s} {max(total - floor, 0.0) / SCAN:8.3f} ms/block")

    def resample(carry):
        if rs_plan[0] == "unit":
            from openal_soft_tpu.ops.pallas import resample_unit as ru
            return ru.resample_voices_unit(
                pool.reshape(-1, 128), cfg["src_off"], cfg["src_len"],
                cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
                carry["ev"]["has_wrapped"], carry["ev"]["pos_int"],
                cfg["rs_unit_w"], T, taps)
        return rs_pallas.resample_voices_pallas2(
            pool.reshape(-1, 128), cfg["src_off"], cfg["src_len"],
            cfg["loop_start"], cfg["loop_end"], cfg["has_loop"],
            carry["ev"]["has_wrapped"], carry["ev"]["pos_int"],
            carry["ev"]["pos_frac"], cfg["increment"], cfg["bank_row"],
            cfg["sf"], d._bank_pad, T, taps, span, winw)

    def advance(carry):
        ev2 = dict(carry["ev"])
        pi2, pf2 = rs_ops.advance_positions(
            carry["ev"]["pos_int"], carry["ev"]["pos_frac"],
            cfg["increment"], jnp.int32(T))
        ll = jnp.maximum(cfg["loop_end"] - cfg["loop_start"], 1)
        rebase = cfg["has_loop"] & (pi2 >= cfg["loop_end"])
        pi2 = jnp.where(rebase,
                        cfg["loop_start"] + (pi2 - cfg["loop_start"]) % ll,
                        pi2)
        ev2["pos_int"], ev2["pos_frac"] = pi2, pf2
        ev2["has_wrapped"] = carry["ev"]["has_wrapped"] | rebase
        return ev2

    # A: resample + advance
    def st_a(carry):
        x = resample(carry)
        c = dict(carry)
        c["ev"] = advance(carry)
        c["acc"] = x[:1, :1].sum() * 1e-30
        return c

    carry0 = {"ev": ev, "state": state, "acc": jnp.float32(0)}
    report("A resample+advance:", scan_stage(st_a), carry0)

    # B: + active where + biquad + where
    def biquad_part(carry, x):
        x = jnp.where(cfg["active"][:, None], x, 0.0)
        y, z2, cf2, cnt2 = d._biquad(
            x, carry["state"]["filter_z"], carry["ev"]["filter_coeffs"],
            cfg["filter_target"], carry["ev"]["filter_counter"], T)
        x_mix = jnp.where(cfg["filter_active"][:, None], y, x)
        st2 = dict(carry["state"])
        fa = cfg["filter_active"]
        st2["filter_z"] = jnp.where(fa[:, None, None], z2, 0.0)
        ev2 = advance(carry)
        ev2["filter_coeffs"] = jnp.where(fa[:, None, None], cf2,
                                         cfg["filter_target"])
        ev2["filter_counter"] = jnp.where(fa, cnt2, 0)
        ev2["fade"] = jnp.zeros_like(carry["ev"]["fade"])
        return x, x_mix, st2, ev2

    def st_b(carry):
        x, x_mix, st2, ev2 = biquad_part(carry, resample(carry))
        return {"ev": ev2, "state": st2, "acc": x_mix[:1, :1].sum() * 1e-30}

    report("B +biquad+wheres:", scan_stage(st_b), carry0)

    # C: + dry mix
    def mix_part(carry, x_mix, ev2):
        dry_tgt = jnp.where(cfg["playing"][:, None], cfg["dry_tgt"], 0.0)
        dry, cur2 = mix_ops.mix_voices(x_mix, carry["ev"]["dry_cur"], dry_tgt,
                                       carry["ev"]["fade"], fade)
        ev2["dry_cur"] = cur2
        return dry

    def st_c(carry):
        x, x_mix, st2, ev2 = biquad_part(carry, resample(carry))
        dry = mix_part(carry, x_mix, ev2)
        return {"ev": ev2, "state": st2, "acc": dry[:1, :1].sum() * 1e-30}

    report("C +dry mix:", scan_stage(st_c), carry0)

    # D: + voice hrtf accum
    def hrtf_part(carry, x_mix, st2):
        x_cat = jnp.concatenate([carry["state"]["hrtf_history"], x_mix], axis=1)
        st2["hrtf_history"] = x_cat[:, T:]
        g_eff = jnp.where(cfg["playing"], cfg["hrtf_gain"], 0.0)
        return hrtf_mix.hrtf_voices_accum(
            x_cat, cfg["hrtf_coeffs"], cfg["hrtf_delay"], g_eff,
            cfg["hrtf_old_coeffs"], cfg["hrtf_old_delay"],
            cfg["hrtf_old_gain"], carry["ev"]["fade"], cfg["active"], T, fade)

    def st_d(carry):
        x, x_mix, st2, ev2 = biquad_part(carry, resample(carry))
        dry = mix_part(carry, x_mix, ev2)
        y_ext = hrtf_part(carry, x_mix, st2)
        return {"ev": ev2, "state": st2,
                "acc": y_ext[:1, :1].sum() * 1e-30 + dry[:1, :1].sum() * 1e-30}

    report("D +voice hrtf:", scan_stage(st_d), carry0)

    # E: + hf_scale + direct + fold (the full graph tail)
    def st_e(carry):
        x, x_mix, st2, ev2 = biquad_part(carry, resample(carry))
        dry = mix_part(carry, x_mix, ev2)
        y_ext = hrtf_part(carry, x_mix, st2)
        scaled, sp2 = d._hrtf_splitter.hf_scale(
            dry, carry["state"]["direct_split"], d._direct_hf_scales)
        st2["direct_split"] = sp2
        y_ext = y_ext + hrtf_mix.direct_hrtf_accum(scaled, d._direct_coeffs, T)
        out, new_tail = hrtf_mix.fold_accum(y_ext, carry["state"]["hrtf_tail"], T)
        st2["hrtf_tail"] = new_tail
        return {"ev": ev2, "state": st2, "acc": out[:1, :1].sum() * 1e-30}

    report("E +hfscale+direct+fold:", scan_stage(st_e), carry0)

    # F: the real _render_one
    def st_f(carry):
        out, st2, ev2 = d._render_one(carry["state"], carry["ev"], cfg, pool,
                                      T, taps, rs_plan)
        return {"ev": ev2, "state": st2, "acc": out[:1, :1].sum() * 1e-30}

    report("F full _render_one:", scan_stage(st_f), carry0)


if __name__ == "__main__":
    main()
