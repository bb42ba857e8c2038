import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")

g = jax.jit(lambda x: x * 2.0)
for mb, shape in ((0.008, (2, 1024)), (0.125, (32, 1024)), (1, (256, 1024)),
                  (4, (1024, 1024))):
    big = jnp.zeros(shape, jnp.float32)
    y = g(big); y.block_until_ready()
    ts = []
    for _ in range(5):
        y = g(big); y.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(y)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"{mb:7.3f} MB pure D2H: {dt*1e3:8.2f} ms -> {mb/dt:7.1f} MB/s",
          flush=True)

# dispatch-overhead ladder: N chained tiny jitted calls, one sync
h = jax.jit(lambda x: x + 1.0)
m = jnp.zeros((8, 128), jnp.float32)
h(m).block_until_ready()
for n in (1, 10, 50):
    t0 = time.perf_counter()
    z = m
    for _ in range(n):
        z = h(z)
    z.block_until_ready()
    print(f"{n:3d} chained tiny dispatches: {(time.perf_counter()-t0)*1e3:7.2f} ms",
          flush=True)
