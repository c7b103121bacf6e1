import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import traceback

T, B, L = 4096, 2048, 128
def kern(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
f = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, L), jnp.float32),
)
tab = jax.random.normal(jax.random.PRNGKey(0), (T, L), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, T)
try:
    r = jax.jit(f)(tab, idx)
    print('ran, shape', r.shape)
    want = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
    print('allclose:', np.allclose(np.asarray(r), want))
except Exception:
    traceback.print_exc()
