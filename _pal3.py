import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench(f, *args, iters=10):
    r = f(*args); float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0=time.perf_counter()
    for _ in range(iters): r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter()-t0)/iters*1000

def make(T, B, L):
    def kern(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.float32),
    )

for (T, B, L) in [(1024, 256, 128), (4096, 2048, 128), (8192, 4096, 128), (8192, 8192-8, 128), (16384, 8192, 128), (4096, 2048, 256)]:
    tab = jax.random.normal(jax.random.PRNGKey(0), (T, L), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, T)
    try:
        f = jax.jit(make(T, B, L))
        r = f(tab, idx)
        want = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
        ok = np.allclose(np.asarray(r), want)
        ms = bench(f, tab, idx)
        print(f'T={T} B={B} L={L}: correct={ok} {ms:.3f} ms ({B*L/ms/1e3:.0f}M elems/s)', flush=True)
    except Exception as e:
        print(f'T={T} B={B} L={L}: FAIL {type(e).__name__} {str(e)[:120]}', flush=True)
