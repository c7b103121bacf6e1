import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_kernel(name, T, B, L, fn):
    tab = jax.random.normal(jax.random.PRNGKey(0), (T, L), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, T)
    def kern(tab_ref, idx_ref, out_ref):
        out_ref[:] = fn(tab_ref[:], idx_ref[:])
    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L), jnp.float32),
        )
        r = jax.jit(f)(tab, idx)
        want = jnp.take_along_axis(tab, idx, axis=0) if B==T else jnp.take_along_axis(jnp.broadcast_to(tab, (max(B,T), L))[:T], jnp.clip(idx,0,T-1), axis=0)
        ok = bool(jnp.allclose(r, jnp.take_along_axis(tab, jnp.clip(idx,0,T-1), axis=0))) if B==T else None
        print(f'{name}: OK correct={ok}', flush=True)
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__}: {str(e)[:200]}', flush=True)

# take_along_axis same shapes
try_kernel('taa T==B L128', 1024, 1024, 128, lambda t,i: jnp.take_along_axis(t, i, axis=0))
# different B
try_kernel('taa B<T L128', 1024, 256, 128, lambda t,i: jnp.take_along_axis(t, i, axis=0))
# bigger T
try_kernel('taa T==B=8192', 8192, 8192, 128, lambda t,i: jnp.take_along_axis(t, i, axis=0))
