import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench(f, *args, iters=10):
    r = f(*args); float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0=time.perf_counter()
    for _ in range(iters): r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter()-t0)/iters*1000

T, C = 524288, 2
B = 262144        # points per call
K = 8             # corners
tab = jax.random.normal(jax.random.PRNGKey(0), (T, C), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (B, K), 0, T)

# variant A: take() on VMEM-resident table inside kernel
def kern_a(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]                      # [T, C]
    i = idx_ref[:]                      # [Bc, K]
    v = jnp.take(t, i.reshape(-1), axis=0)   # [Bc*K, C]
    out_ref[:] = v.reshape(i.shape[0], K * C)

BC = 2048
try:
    fa = pl.pallas_call(
        kern_a,
        grid=(B // BC,),
        in_specs=[
            pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BC, K * C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K * C), jnp.float32),
    )
    fa = jax.jit(fa)
    r = fa(tab, idx)
    # correctness
    want = jnp.take(tab, idx.reshape(-1), axis=0).reshape(B, K*C)
    print('A correct:', bool(jnp.allclose(r, want)), flush=True)
    print('A pallas take-in-kernel:', bench(fa, tab, idx), 'ms', flush=True)
except Exception as e:
    print('A failed:', type(e).__name__, str(e)[:500], flush=True)
