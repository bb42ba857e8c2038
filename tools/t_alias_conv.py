"""Empirically determine input_output_aliases index base under
PrefetchScalarGridSpec: do indices count the scalar-prefetch operands?"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(sc, a_ref, b_ref, ao_ref, bo_ref):
    ao_ref[...] = a_ref[...] + sc[0].astype(jnp.float32)
    bo_ref[...] = b_ref[...] * 2.0


def run(aliases):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
    )
    f = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 2,
        input_output_aliases=aliases)
    sc = jnp.array([3], jnp.int32)
    a = jnp.full((8, 128), 1.0, jnp.float32)
    b = jnp.full((8, 128), 5.0, jnp.float32)
    ao, bo = f(sc, a, b)
    print(f"aliases={aliases}: ao={float(ao[0,0])} (want 4.0) "
          f"bo={float(bo[0,0])} (want 10.0)")


for al in ({1: 0, 2: 1}, {0: 0, 1: 1}):
    try:
        run(al)
    except Exception as e:
        print(f"aliases={al}: FAILED {type(e).__name__}: {str(e)[:200]}")
