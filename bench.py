"""Benchmark: audio-seconds rendered per second per chip.

Renders a large population of concurrent voices through the batched block
graph on the real device and reports throughput as a multiple of realtime,
plus p99 block latency.  Prints ONE json line.

Baseline context: the reference publishes no benchmark numbers
(BASELINE.md); the comparison basis is the north-star target of >=100x
realtime at 4096 HRTF voices on one chip.  vs_baseline is reported against
1.0x realtime (what a correct realtime renderer must sustain).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compile cache: the first block-graph compile is 30-60 s
    # (and the Pallas kernels more); amortize across runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from openal_soft_tpu.alc.device import LoopbackDevice

    n_voices = 4096
    sample_rate = 48000
    block = 1024
    batch = 256 * block   # chunked dispatch horizon (amortizes the
                          # per-dispatch host<->device round trip)

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

    # Warm up (compile both the single-block and chunked graphs)
    dev.render_samples(block)
    dev.render_samples(batch)

    # Throughput: chunked dispatch (static scene, the renderer runs ahead).
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        dev.render_samples(batch)
        times.append((time.perf_counter() - t0) / 256)

    # Latency: single-block dispatches (interactive param-update cadence).
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        dev.render_samples(block)
        lat.append(time.perf_counter() - t0)

    audio_sec = block / sample_rate
    xrealtime = audio_sec / float(np.median(times))
    p99_ms = float(np.percentile(lat, 99) * 1e3)
    med_ms = float(np.median(lat) * 1e3)

    print(json.dumps({
        "metric": f"audio-sec/sec/chip ({n_voices} HRTF voices, {sample_rate} Hz, "
                  f"{block}-frame blocks; single-block dispatch med "
                  f"{med_ms:.2f} ms / p99 {p99_ms:.2f} ms incl. ~29 ms "
                  f"axon-tunnel round-trip floor)",
        "value": round(float(xrealtime), 2),
        "unit": "x realtime",
        "vs_baseline": round(float(xrealtime), 2),
    }))


if __name__ == "__main__":
    main()
