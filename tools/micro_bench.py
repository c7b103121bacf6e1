"""Micro-benchmarks for round-2 march/gather hypotheses (run on the TPU)."""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def bench(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    k = jax.random.PRNGKey(0)
    N, L, S = 4096, 1024, 32
    mask = jax.random.uniform(k, (N, L)) < 0.03

    # --- compact: searchsorted vs top_k vs argsort ---
    @jax.jit
    def compact_ss(mask):
        cum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        targets = jnp.arange(1, S + 1, dtype=jnp.int32)
        pos = jax.vmap(lambda c: jnp.searchsorted(c, targets, side="left"))(cum)
        valid = targets[None, :] <= cum[:, -1:]
        return jnp.minimum(pos, L - 1), valid

    @jax.jit
    def compact_topk(mask):
        score = jnp.where(mask, jnp.int32(L) - jnp.arange(L, dtype=jnp.int32),
                          0)
        vals, idx = lax.top_k(score, S)
        return idx, vals > 0

    print(f"compact searchsorted [{N},{L}]->{S}: "
          f"{bench(compact_ss, (mask,)):7.2f} ms")
    print(f"compact top_k        [{N},{L}]->{S}: "
          f"{bench(compact_topk, (mask,)):7.2f} ms")
    p1, v1 = compact_ss(mask)
    p2, v2 = compact_topk(mask)
    ok = bool(jnp.all(jnp.where(v1, p1, -1) == jnp.where(v2, p2, -1)) &
              jnp.all(v1 == v2))
    print(f"  agree: {ok}")

    # --- raw gather rates ---
    for rows_m, width, dt in [(2.1e6, 1, jnp.uint8), (2.1e6, 1, jnp.int32)]:
        table = jnp.zeros((int(rows_m), width), dt)
        for n in [524288, 2097152]:
            idx = jax.random.randint(jax.random.fold_in(k, n), (n,), 0,
                                     int(rows_m))

            @jax.jit
            def g(t, i):
                return jnp.take(t, i, axis=0)

            ms = bench(g, (table, idx))
            print(f"gather {n/1e6:.2f}M rows from [{int(rows_m)},{width}] "
                  f"{dt.__name__}: {ms:6.2f} ms = {n/ms*1e3/1e6:.0f}M rows/s")

    # gather bool bitfield (as in march)
    bf = jnp.zeros((2097152,), jnp.bool_)
    idx = jax.random.randint(k, (N * L,), 0, 2097152)

    @jax.jit
    def gbool(t, i):
        return t[i]

    ms = bench(gbool, (bf, idx))
    print(f"gather bool flat {N*L/1e6:.2f}M: {ms:6.2f} ms = "
          f"{N*L/ms*1e3/1e6:.0f}M rows/s")

    # --- segmented composite (associative scan) vs per-ray cumprod ---
    M = N * 12
    alphas = jax.random.uniform(k, (M,)) * 0.1
    seg = jnp.sort(jax.random.randint(k, (M,), 0, N))

    @jax.jit
    def seg_scan(alphas, seg):
        # segmented product scan: carry (value, segid)
        om = 1.0 - alphas

        def combine(a, b):
            av, ai = a
            bv, bi = b
            return jnp.where(ai == bi, av * bv, bv), bi

        vals, _ = lax.associative_scan(combine, (om, seg))
        return vals

    ms = bench(seg_scan, (alphas, seg))
    print(f"segmented cumprod [{M}]: {ms:6.2f} ms")

    a2 = jax.random.uniform(k, (N, S)) * 0.1

    @jax.jit
    def dense_cum(a):
        return jnp.cumprod(1 - a, axis=-1)

    print(f"dense cumprod [{N},{S}]: {bench(dense_cum, (a2,)):6.2f} ms")

    # --- scatter-based global compaction ---
    maskf = mask.reshape(-1)

    @jax.jit
    def flat_nonzero(m):
        return jnp.nonzero(m, size=M, fill_value=N * L - 1)[0]

    print(f"flat nonzero [{N*L}] -> {M}: {bench(flat_nonzero, (maskf,)):6.2f} ms")


if __name__ == "__main__":
    main()
