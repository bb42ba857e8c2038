import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/openal_tpu_jax_cache")
f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros(8, jnp.float32)
f(x).block_until_ready()
ts = []
for _ in range(20):
    t0 = time.perf_counter(); f(x).block_until_ready(); ts.append(time.perf_counter()-t0)
print("empty rtt ms:", np.median(ts)*1e3)
# D2H bandwidth: 4 MB array
g = jax.jit(lambda x: x * 2.0)
big = jnp.zeros((1024, 1024), jnp.float32)
y = g(big); y.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    np.asarray(jax.device_get(g(big)))
dt = (time.perf_counter()-t0)/3
print(f"4MB D2H+compute: {dt*1e3:.1f} ms -> {4/dt:.1f} MB/s")
# chained dispatch cost: 20 sequential jitted calls w/o sync
h = jax.jit(lambda x: x @ x)
m = jnp.zeros((512,512), jnp.float32)
h(m).block_until_ready()
t0 = time.perf_counter()
z = m
for _ in range(20): z = h(z)
z.block_until_ready()
print(f"20 chained 512-matmuls: {(time.perf_counter()-t0)*1e3:.1f} ms")
