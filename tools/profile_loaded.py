"""Stage-level timing of the LOADED 4096-voice scene (bench.py `loaded`).

Scene: 4096 HRTF voices with mixed pitches (2^+-1) + one EAXReverb slot
with per-voice sends — the realistic workload whose round-4 figure
(5.52x) sits 9x below the best case.  Times each stage of the loaded
block graph inside a SCAN-iteration lax.scan (amortizing the tunnel
round trip), at per-block and super-block granularity, to locate the
cliff.  Not part of the test suite.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

SCAN = 16
BLOCK = 1024


def timeit(fn, *args, n=6, warmup=2):
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    n_voices, rate = 4096, 48000
    dev = LoopbackDevice(frequency=rate, channels="stereo",
                         sample_type="float32", capacity=n_voices, hrtf=True)
    ctx = dev.create_context()
    slot = ctx.create_aux_slot()
    eff = ctx.create_effect("eaxreverb")
    slot.set_effect(eff)
    rng = np.random.default_rng(42)
    t = np.arange(rate) / rate
    bufs = []
    for fi in range(48):
        tone = (0.1 * np.sin(2 * np.pi * 110.0 * 2 ** (fi / 12) * t)
                ).astype(np.float32)
        buf = ctx.create_buffer()
        buf.set_data(tone, "mono", "float32", rate)
        bufs.append(buf)
    for i in range(n_voices):
        src = ctx.create_source()
        src.buffer(bufs[i % 48])
        src.looping = True
        src.set("position", tuple(rng.standard_normal(3) * 3.0))
        src.set("pitch", float(2.0 ** rng.uniform(-1, 1)))
        src.send(slot, 0)
        src.play()
    dev.render_samples(BLOCK)
    dev.render_samples(BLOCK)

    d = dev
    state = dict(d._state)
    ev = d._ev_dev if d._ev_dev is not None else d.table.evolving_dict()
    cfg = d._cfg_dev
    pool = d.pool.device_array()
    taps = d._taps
    T = BLOCK
    print(f"taps={taps} n_dry={d.n_dry} slots={len(d.slots)} "
          f"wet_channels={d.wet_channels} "
          f"max_inc={int(d.table.increment.max())} "
          f"rs_plan(1)={d._rs_plan(T, 1)} rs_plan(512)={d._rs_plan(T, 512)}")

    @jax.jit
    def empty(x):
        return x + 1.0

    floor = timeit(empty, jnp.zeros((8, 128)))
    print(f"dispatch floor:          {floor:8.3f} ms")

    def report(name, run, *args, blocks=1):
        total = timeit(run, *args)
        print(f"{name:30s} {max(total - floor, 0.0) / SCAN / blocks:8.3f} "
              f"ms/block   (scan total {total:7.1f} ms)")

    # --- general pallas resampler at several window sizes -----------------
    max_inc = int(d.table.increment.max())
    winw = rs_pallas.winw_for(max_inc, taps)
    pool2d = pool.reshape(-1, 128)
    for sb in (1, 2, 4):
        W = sb * T
        need = (((W - rs_pallas.LANE) * max_inc)
                >> 16) + winw + 1
        if need > rs_pallas.SPAN_BUCKETS[-1]:
            print(f"resample(gen) sb={sb}: span {need} exceeds buckets")
            continue
        span = rs_pallas.span_for_increment(max_inc, W, winw)

        def st_rs(carry, cfg, pool2d, W=W, span=span):
            x = rs_pallas.resample_voices_pallas2(
                pool2d, cfg["src_off"], cfg["src_len"], cfg["loop_start"],
                cfg["loop_end"], cfg["has_loop"], carry["has_wrapped"],
                carry["pos_int"], carry["pos_frac"], cfg["increment"],
                cfg["bank_row"], cfg["sf"], d._bank_pad, W, taps, span, winw)
            c = dict(carry)
            c["acc"] = carry["acc"] + x[:, :8].sum()
            return c

        carry0 = {"has_wrapped": ev["has_wrapped"], "pos_int": ev["pos_int"],
                  "pos_frac": ev["pos_frac"], "acc": jnp.float32(0)}
        report(f"resample(gen,pallas) sb={sb}:", scan_stage(st_rs), carry0,
               cfg, pool2d, blocks=sb)

    # --- jnp gather resampler at 1 and 16 blocks ---------------------------
    for sb in (1, 16):
        W = sb * T

        def st_rsj(carry, cfg, pool, W=W):
            x = rs_ops.resample_voices(
                pool, cfg["src_off"], cfg["src_len"], cfg["loop_start"],
                cfg["loop_end"], cfg["has_loop"], carry["has_wrapped"],
                carry["pos_int"], carry["pos_frac"], cfg["increment"],
                cfg["bank_row"], cfg["sf"], d._bank, W, taps)
            c = dict(carry)
            c["acc"] = carry["acc"] + x[:, :8].sum()
            return c

        carry0 = {"has_wrapped": ev["has_wrapped"], "pos_int": ev["pos_int"],
                  "pos_frac": ev["pos_frac"], "acc": jnp.float32(0)}
        report(f"resample(jnp gather) sb={sb}:", scan_stage(st_rsj), carry0,
               cfg, pool, blocks=sb)

    # --- HRTF accum: per-block concat vs super-block split ----------------
    fade = 64

    def st_hrtf_pb(carry, cfg):
        x_cat = jnp.concatenate([carry["hist"], carry["x"]], axis=1)
        g_eff = jnp.where(cfg["playing"], cfg["hrtf_gain"], 0.0)
        y_ext = hrtf_mix.hrtf_voices_accum(
            x_cat, cfg["hrtf_coeffs"], cfg["hrtf_delay"], g_eff,
            cfg["hrtf_old_coeffs"], cfg["hrtf_old_delay"],
            cfg["hrtf_old_gain"], carry["fade"], cfg["active"], T, fade)
        out, tail = hrtf_mix.fold_accum(y_ext, carry["tail"], T)
        c = dict(carry)
        c["hist"] = x_cat[:, T:]
        c["tail"] = tail
        c["acc"] = carry["acc"] + out[:, :4].sum()
        return c

    x1 = jnp.zeros((n_voices, T), jnp.float32)
    carry0 = {"hist": state["hrtf_history"], "tail": state["hrtf_tail"],
              "x": x1, "fade": ev["fade"], "acc": jnp.float32(0)}
    report("hrtf accum per-block:", scan_stage(st_hrtf_pb), carry0, cfg)

    W = 16 * T

    def st_hrtf_sb(carry, cfg):
        g_eff = jnp.where(cfg["playing"], cfg["hrtf_gain"], 0.0)
        y_ext = hrtf_mix.hrtf_voices_accum_split(
            carry["hist"], carry["x"], cfg["hrtf_coeffs"], cfg["hrtf_delay"],
            g_eff, cfg["hrtf_old_coeffs"], cfg["hrtf_old_delay"],
            cfg["hrtf_old_gain"], carry["fade"], cfg["active"], W, fade)
        out, tail = hrtf_mix.fold_accum(y_ext, carry["tail"], W)
        c = dict(carry)
        c["hist"] = carry["x"][:, W - hrtf_mix.HIST:]
        c["tail"] = tail
        c["acc"] = carry["acc"] + out[:, :4].sum()
        return c

    xw = jnp.zeros((n_voices, W), jnp.float32)
    carry0 = {"hist": state["hrtf_history"], "tail": state["hrtf_tail"],
              "x": xw, "fade": ev["fade"], "acc": jnp.float32(0)}
    report("hrtf accum split sb=16:", scan_stage(st_hrtf_sb), carry0, cfg,
           blocks=16)

    # --- wet mix (grouped) at T and 16T ------------------------------------
    n_slots = len(d.slots)
    B = d.wet_channels

    for sb in (1, 16):
        Wm = sb * T

        def st_wet(carry, cfg, Wm=Wm):
            wet_tgt = jnp.where(cfg["playing"][:, None],
                                cfg["wet_tgt"][:, 0, :B], 0.0)
            group = jnp.where(cfg["wet_active"][:, 0],
                              cfg["wet_slot"][:, 0], n_slots)
            bus, cur = mix_ops.mix_voices_grouped(
                carry["x"], carry["cur"], wet_tgt, carry["fade"], group,
                n_slots + 1, 64)
            c = dict(carry)
            c["cur"] = cur
            c["acc"] = carry["acc"] + bus[0, :, :4].sum()
            return c

        xm = jnp.zeros((n_voices, Wm), jnp.float32)
        carry0 = {"x": xm, "cur": ev["wet_cur"][:, 0, :B],
                  "fade": ev["fade"], "acc": jnp.float32(0)}
        report(f"wet mix grouped sb={sb}:", scan_stage(st_wet), carry0, cfg,
               blocks=sb)

    # --- dry mix at T and 16T ----------------------------------------------
    for sb in (1, 16):
        Wm = sb * T

        def st_dry(carry, cfg, Wm=Wm):
            dry_tgt = jnp.where(cfg["playing"][:, None], cfg["dry_tgt"], 0.0)
            dry, cur = mix_ops.mix_voices(carry["x"], carry["cur"], dry_tgt,
                                          carry["fade"], 64)
            c = dict(carry)
            c["cur"] = cur
            c["acc"] = carry["acc"] + dry[:, :4].sum()
            return c

        xm = jnp.zeros((n_voices, Wm), jnp.float32)
        carry0 = {"x": xm, "cur": ev["dry_cur"], "fade": ev["fade"],
                  "acc": jnp.float32(0)}
        report(f"dry mix sb={sb}:", scan_stage(st_dry), carry0, cfg,
               blocks=sb)

    # --- EAXReverb process at T and 16T -------------------------------------
    slot_obj = d.slots[0]
    for sb in (1, 16):
        Wm = sb * T

        def st_rev(carry, cfg, Wm=Wm):
            contrib, _, st2 = slot_obj.state.process(
                carry["st"], cfg["slot0"], carry["wet"], Wm)
            c = dict(carry)
            c["st"] = st2
            c["acc"] = carry["acc"] + contrib[:, :4].sum()
            return c

        wet = jnp.zeros((B, Wm), jnp.float32)
        carry0 = {"st": state["slot0"], "wet": wet, "acc": jnp.float32(0)}
        report(f"eaxreverb process sb={sb}:", scan_stage(st_rev), carry0,
               cfg, blocks=sb)

    # --- full loaded chunk for reference ------------------------------------
    batch = 512 * BLOCK
    dev.render_samples(batch)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        dev.render_samples(batch)
        ts.append((time.perf_counter() - t0) / 512)
    ms = float(np.median(ts) * 1e3)
    print(f"full loaded end-to-end:        {ms:8.3f} ms/block "
          f"({(BLOCK / rate) * 1e3 / ms:.2f}x realtime)")


if __name__ == "__main__":
    main()
