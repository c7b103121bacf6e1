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

T, C = 524288, 128     # cell-packed row width
M = 262_144         # rows to gather
CHUNK = 512           # indices per grid step
NBUF = 16             # DMA pipeline depth

tab = jax.random.normal(jax.random.PRNGKey(0), (T, C), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, T)

def kern(idx_ref, tab_ref, out_ref, buf, sems):
    # idx_ref: scalar-prefetch [M]; tab_ref: HBM [T, C]; out: VMEM [CHUNK, C]
    c = pl.program_id(0)
    base = c * CHUNK
    def get(slot, j):
        return pltpu.make_async_copy(
            tab_ref.at[idx_ref[base + j]], buf.at[slot, 0], sems.at[slot])
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

grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(M // CHUNK,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((CHUNK, C), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((NBUF, 1, C), jnp.float32),
                    pltpu.SemaphoreType.DMA((NBUF,))],
)
try:
    f = jax.jit(pl.pallas_call(kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32)))
    r = f(idx, tab)
    want = np.asarray(tab)[np.asarray(idx)]
    print('correct:', np.allclose(np.asarray(r), want), flush=True)
    ms = bench(f, idx, tab)
    print(f'pallas dma-gather {M} rows x{C}: {ms:.2f} ms -> {M/ms/1e3:.0f}M rows/s', flush=True)
except Exception as e:
    import traceback; traceback.print_exc()
