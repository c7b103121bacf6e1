import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench(f, *args, iters=20):
    r = f(*args); float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0=time.perf_counter()
    for _ in range(iters): r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter()-t0)/iters*1000

for T in (8, 32, 128, 512, 1024, 4096):
    L = 128
    def kern(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, L), jnp.float32),
    )
    tab = jax.random.normal(jax.random.PRNGKey(0), (T, L), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (T, L), 0, T)
    try:
        r = jax.jit(f)(tab, idx)
        want = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
        ok = np.allclose(np.asarray(r), want)
        ms = bench(jax.jit(f), tab, idx)
        print(f'T={T}: correct={ok} {ms:.3f}ms -> {T*L*20/ms/1e3:.0f}M elem/s... ({T*L/ms*1e-3:.1f}M/ms)', flush=True)
    except Exception as e:
        print(f'T={T}: FAIL {type(e).__name__} {str(e)[:100]}', flush=True)
