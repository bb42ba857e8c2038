"""Benchmark: audio-seconds rendered per second per chip.

Two scenes through the batched block graph on the real device:

* best_case — 4096 HRTF voices, native-rate looping tones (the
  unit-increment resampler fast path; the population-throughput headline).
* loaded    — 4096 HRTF voices with mixed pitches plus one EAXReverb slot
  with per-voice sends (the dryrun composition: general resampler, send
  filters, wet bus, effect pipeline).

Also reported: single-block dispatch latency (median/p99) and the measured
empty-dispatch round trip (rtt_ms — the host<->device transport floor,
which on an axon-tunneled chip dominates single-block latency).

Baseline context: the reference publishes no benchmark numbers
(BASELINE.md); the comparison basis is the north-star target of >=100x
realtime at 4096 HRTF voices on one chip.  vs_baseline is reported against
1.0x realtime (what a correct realtime renderer must sustain).

Prints ONE json line.
"""

from __future__ import annotations

import json
import time

import numpy as np

N_VOICES = 4096
RATE = 48000
BLOCK = 1024
CHUNK_BLOCKS = 512            # dispatch horizon (amortizes the round trip)


def _measure_rtt_ms() -> float:
    """Blocking-call transport floor: dispatch a fresh trivial kernel,
    wait for its completion signal, and fetch its 8 KB output — the exact
    sequence a single-block render pays per call.

    (Round-4's probe timed block_until_ready on an op that had already
    completed, which measures only Python overhead — hence the published
    rtt_ms=0.04 contradicting the ~30 ms single-block medians.  Measured
    on this rig: the completion-notify + D2H floor is ~24 ms regardless
    of payload down to 8 KB, while extra QUEUED dispatches cost only
    ~0.5 ms each — which is why deep pipelined horizons hit 45x+ while
    per-block blocking calls sit at the floor; tools/probe_d2h.py.)"""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((2, 1024), jnp.float32)
    np.asarray(f(x))
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def _scene(loaded: bool):
    from openal_soft_tpu.alc.device import LoopbackDevice

    dev = LoopbackDevice(frequency=RATE, channels="stereo",
                         sample_type="float32", capacity=N_VOICES,
                         hrtf=True)
    ctx = dev.create_context()
    slot = None
    if loaded:
        slot = ctx.create_aux_slot()
        eff = ctx.create_effect("eaxreverb")
        slot.set_effect(eff)
    rng = np.random.default_rng(42)
    t = np.arange(RATE) / RATE
    bufs = []
    for fi in range(48):
        freq = 110.0 * (2.0 ** (fi / 12.0))
        tone = (0.1 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        buf = ctx.create_buffer()
        buf.set_data(tone, "mono", "float32", RATE)
        bufs.append(buf)
    for i in range(N_VOICES):
        src = ctx.create_source()
        src.buffer(bufs[i % 48])
        src.looping = True
        src.set("position", tuple(rng.standard_normal(3) * 3.0))
        if loaded:
            src.set("pitch", float(2.0 ** rng.uniform(-1, 1)))
            src.send(slot, 0)
        src.play()
    return dev


def _throughput(dev, n_chunks: int = 3) -> float:
    batch = CHUNK_BLOCKS * BLOCK
    dev.render_samples(batch)     # warm (compile)
    times = []
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        dev.render_samples(batch)
        times.append((time.perf_counter() - t0) / CHUNK_BLOCKS)
    return (BLOCK / RATE) / float(np.median(times))


def main() -> None:
    import jax

    # Persistent compile cache: the first block-graph compile is 30-60 s
    # (and the Pallas kernels more); amortize across runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    rtt_ms = _measure_rtt_ms()

    dev = _scene(loaded=False)
    best_case = _throughput(dev)

    # Latency: single-block dispatches (interactive param-update cadence).
    dev.render_samples(BLOCK)     # warm the single-block graph
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        dev.render_samples(BLOCK)
        lat.append(time.perf_counter() - t0)
    med_ms = float(np.median(lat) * 1e3)
    p99_ms = float(np.percentile(lat, 99) * 1e3)
    del dev

    loaded_dev = _scene(loaded=True)
    loaded = _throughput(loaded_dev)

    print(json.dumps({
        "metric": f"audio-sec/sec/chip ({N_VOICES} HRTF voices, {RATE} Hz, "
                  f"{BLOCK}-frame blocks, {CHUNK_BLOCKS}-block chunks)",
        "value": round(float(best_case), 2),
        "unit": "x realtime",
        "vs_baseline": round(float(best_case), 2),
        "loaded": round(float(loaded), 2),
        "rtt_ms": round(rtt_ms, 2),
        "block_latency_med_ms": round(med_ms, 2),
        "block_latency_p99_ms": round(p99_ms, 2),
    }))


if __name__ == "__main__":
    main()
