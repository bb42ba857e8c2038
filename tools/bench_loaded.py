import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from openal_soft_tpu.alc.device import LoopbackDevice

N, RATE, BLOCK, CHUNK = 4096, 48000, 1024, 512

dev = LoopbackDevice(frequency=RATE, channels="stereo",
                     sample_type="float32", capacity=N, hrtf=True)
ctx = dev.create_context()
slot = ctx.create_aux_slot()
eff = ctx.create_effect("eaxreverb")
slot.set_effect(eff)
rng = np.random.default_rng(42)
t = np.arange(RATE) / RATE
bufs = []
for fi in range(48):
    tone = (0.1 * np.sin(2 * np.pi * 110.0 * 2 ** (fi / 12) * t)).astype(np.float32)
    b = ctx.create_buffer(); b.set_data(tone, "mono", "float32", RATE); bufs.append(b)
for i in range(N):
    src = ctx.create_source()
    src.buffer(bufs[i % 48]); src.looping = True
    src.set("position", tuple(rng.standard_normal(3) * 3.0))
    src.set("pitch", float(2.0 ** rng.uniform(-1, 1)))
    src.send(slot, 0)
    src.play()

batch = CHUNK * BLOCK
print("warm render (compile)...", flush=True)
t0 = time.perf_counter()
dev.render_samples(batch)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    dev.render_samples(batch)
    ts.append((time.perf_counter() - t0) / CHUNK)
ms = float(np.median(ts) * 1e3)
print(f"loaded: {ms:.3f} ms/block = {(BLOCK/RATE)*1e3/ms:.2f}x realtime")
