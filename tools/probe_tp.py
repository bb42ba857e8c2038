import sys, time
import numpy as np
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

t0 = time.perf_counter(); dev.render_samples(128*1024)
print(f"first 128-block render (compile): {time.perf_counter()-t0:.1f}s", flush=True)
from jax._src import monitoring
for trial in range(6):
    t0 = time.perf_counter(); dev.render_samples(128*1024)
    dt = time.perf_counter()-t0
    print(f"steady 128-block render: {dt*1e3:.0f} ms = {dt/128*1e3:.2f} ms/block",
          flush=True)
print("tracing cache:", dev._render_chunk._cache_size()
      if hasattr(dev._render_chunk, "_cache_size") else "n/a")
