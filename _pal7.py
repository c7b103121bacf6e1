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

T, C = 524288, 128
M = 262_144
CHUNK = 1024
NBUF = 16

tab = jax.random.normal(jax.random.PRNGKey(0), (T, C), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, T)

def kern(idx_ref, tab_ref, out_ref, buf, sems):
    def get(slot, j):
        return pltpu.make_async_copy(
            tab_ref.at[idx_ref[j]], buf.at[slot, 0], sems.at[slot])
    for j in range(NBUF):
        get(j, j).start()
    def body(j, _):
        slot = jax.lax.rem(j, NBUF)
        get(slot, j).wait()
        out_ref[j, :] = buf[slot, 0]
        @pl.when(j + NBUF < CHUNK)
        def _():
            get(slot, j + NBUF).start()
        return 0
    jax.lax.fori_loop(0, CHUNK, body, 0)

f = pl.pallas_call(
    kern,
    grid=(M // CHUNK,),
    in_specs=[
        pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ],
    out_specs=pl.BlockSpec((CHUNK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((NBUF, 1, C), jnp.float32),
                    pltpu.SemaphoreType.DMA((NBUF,))],
)
f = jax.jit(f)
r = f(idx, tab)
want = np.asarray(tab)[np.asarray(idx)]
print('correct:', np.allclose(np.asarray(r), want), flush=True)
ms = bench(f, idx, tab)
print(f'pallas dma-gather {M} rows x{C}f32: {ms:.2f} ms -> {M/ms/1e3:.0f}M rows/s, {M*C*4/ms/1e6:.0f} GB/s', flush=True)
