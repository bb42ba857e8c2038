import numpy as np, jax, jax.numpy as jnp
from openal_soft_tpu.ops import resample as rs_ops, tables
from openal_soft_tpu.ops.pallas import resample_unit as ru

L, T, taps = 16, 256, 4
rng = np.random.default_rng(0)
bank = tables.weight_bank()
pool = jnp.asarray(rng.standard_normal(1 << 16).astype(np.float32))

src_off = np.full(L, 1024, np.int32)
src_len = np.full(L, 8000, np.int32)
ls = np.full(L, 100, np.int32); le = np.full(L, 7000, np.int32)
hl = np.zeros(L, bool); hw = np.zeros(L, bool)
pos = np.full(L, 2000, np.int32)
pos[1] = -200; pos[2] = 7900
hl[3] = True; pos[3] = 3000
hl[4] = True; pos[4] = 6900
hl[5] = True; hw[5] = True; pos[5] = 101
pos_frac = rng.integers(0, 65536, L).astype(np.int32)
bank_row = np.full(L, 2, np.int32)
sf = np.zeros(L, np.float32)

w = ru.unit_weights_np(bank, bank_row, sf, pos_frac, taps)
y_u = np.asarray(ru.resample_voices_unit(
    pool.reshape(-1, 128), jnp.asarray(src_off), jnp.asarray(src_len),
    jnp.asarray(ls), jnp.asarray(le), jnp.asarray(hl), jnp.asarray(hw),
    jnp.asarray(pos), jnp.asarray(w), T, taps))
bank_j = {k: jnp.asarray(v) for k, v in bank.items()}
y_j = np.asarray(rs_ops.resample_voices(
    pool, jnp.asarray(src_off), jnp.asarray(src_len), jnp.asarray(ls),
    jnp.asarray(le), jnp.asarray(hl), jnp.asarray(hw), jnp.asarray(pos),
    jnp.asarray(pos_frac), jnp.asarray(np.full(L, 1 << 16, np.int32)),
    jnp.asarray(bank_row), jnp.asarray(sf), bank_j, T, taps))
for v in range(8):
    d = np.abs(y_u[v] - y_j[v])
    bad = np.nonzero(d > 0)[0]
    print(f"v{v}: maxerr {d.max():.3e} nbad {bad.size} first {bad[:6]}")
