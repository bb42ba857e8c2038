import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from openal_soft_tpu.alc.device import LoopbackDevice
RATE = 48000
dev = LoopbackDevice(frequency=RATE, channels="stereo", sample_type="float32",
                     capacity=512, hrtf=True)
ctx = dev.create_context()
rng = np.random.default_rng(7)
t = np.arange(RATE) / RATE
bufs = []
for fi in range(8):
    tone = (0.1*np.sin(2*np.pi*(110*2**(fi/4))*t)).astype(np.float32)
    b = ctx.create_buffer(); b.set_data(tone, "mono", "float32", RATE); bufs.append(b)
for i in range(512):
    src = ctx.create_source(); src.buffer(bufs[i % 8]); src.looping = True
    src.set("position", tuple(rng.standard_normal(3)*3.0)); src.play()

t0 = time.perf_counter(); dev.render_samples(128*1024); print(f"first 128-block render (compile): {time.perf_counter()-t0:.1f}s")
for trial in range(3):
    t0 = time.perf_counter(); dev.render_samples(128*1024)
    dt = time.perf_counter()-t0
    print(f"steady 128-block render: {dt*1e3:.0f} ms = {dt/128*1e3:.2f} ms/block")

# isolate: dispatch only (no download) by timing _render_chunk directly
rd = dev._core if hasattr(dev, "_core") else dev
# find RenderDevice
core = dev
while not hasattr(core, "_render_chunk"):
    core = core.device if hasattr(core, "device") else core._device
from openal_soft_tpu.core.device import _dedupe_buffers
import openal_soft_tpu.core.device as dmod
T = 1024
ev = core._ev_dev
t0 = time.perf_counter()
core._state = _dedupe_buffers(core._state); ev = _dedupe_buffers(ev)
print(f"dedupe: {(time.perf_counter()-t0)*1e3:.1f} ms")
t0 = time.perf_counter()
plan = core._rs_plan(T, 128); sig = core._chain_signature()
print(f"plan+sig: {(time.perf_counter()-t0)*1e3:.1f} ms  plan={plan}")
t0 = time.perf_counter()
blocks, core._state, ev = core._render_chunk(core._state, ev, core._cfg_dev, core.pool.device_array(), T, 128, core._taps, sig, plan)
print(f"dispatch returned: {(time.perf_counter()-t0)*1e3:.1f} ms")
t0 = time.perf_counter(); blocks.block_until_ready()
print(f"device compute: {(time.perf_counter()-t0)*1e3:.1f} ms")
t0 = time.perf_counter(); arr = np.asarray(jax.device_get(blocks))
print(f"download {arr.nbytes/1e6:.1f} MB: {(time.perf_counter()-t0)*1e3:.1f} ms")
core._ev_dev = ev
