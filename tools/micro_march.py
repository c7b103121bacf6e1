"""Micro-benchmarks for the window-based march/compaction redesign.

Validates on the TPU: (a) the cost of lax.top_k over [N, 1024] at k=96,
(b) window-mask packing + per-slot searchsorted over 64 windows +
bit-rank extraction, (c) the [N*S] cumsum+scatter global compaction vs a
window-level one.  Run: python tools/micro_march.py
"""

import os
import sys
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
    N, L, S, F = 4096, 1024, 96, 16
    W = L // F
    k = jax.random.PRNGKey(0)
    # clustered occupancy: ~13% valid in runs (like the object grid)
    base = jax.random.uniform(k, (N, W)) < 0.25  # occupied windows
    occ = base[:, :, None] & (
        jax.random.uniform(jax.random.fold_in(k, 1), (N, W, F)) < 0.55)
    occ = occ.reshape(N, L)
    print(f"valid_frac={float(occ.mean()):.3f}")

    # --- a) current: top_k over [N, L] ---
    @jax.jit
    def first_k_topk(occ):
        score = jnp.where(occ, jnp.int32(L) - jnp.arange(L, dtype=jnp.int32),
                          0)
        vals, pos = lax.top_k(score, S)
        return jnp.minimum(pos, L - 1), vals > 0

    print(f"top_k [N,{L}] k={S}:        {bench(first_k_topk, (occ,)):7.2f} ms")

    # --- b) window formulation ---
    pow2 = jnp.asarray((2 ** np.arange(F)).astype(np.int32))

    @jax.jit
    def first_k_window(occ):
        occ3 = occ.reshape(N, W, F)
        wmask = jnp.sum(occ3.astype(jnp.int32) * pow2[None, None, :],
                        axis=-1)  # [N, W] uint16-valued
        wcnt = jnp.sum(occ3.astype(jnp.int32), axis=-1)  # [N, W]
        cum = jnp.cumsum(wcnt, axis=-1)  # [N, W] inclusive
        # for each output slot s: window = first w with cum[w] > s
        targets = jnp.arange(S, dtype=jnp.int32)

        win = jax.vmap(
            lambda c: jnp.searchsorted(c, targets, side="right")
        )(cum)  # [N, S]
        win_c = jnp.minimum(win, W - 1)
        base = jnp.take_along_axis(
            jnp.pad(cum, ((0, 0), (1, 0))), win_c, axis=1)  # exclusive
        rank = targets[None, :] - base  # [N, S] rank within window
        wm = jnp.take_along_axis(wmask, win_c, axis=1)  # [N, S]
        # position of the rank-th set bit of wm (16-step select)
        pos_in = jnp.zeros(wm.shape, jnp.int32)
        cnt = jnp.zeros(wm.shape, jnp.int32)
        for p in range(F):
            bit = (wm >> p) & 1
            hit = (bit == 1) & (cnt == rank)
            pos_in = jnp.where(hit, p, pos_in)
            cnt = cnt + bit
        valid = rank < jnp.take_along_axis(cum, win_c, axis=1) - base
        valid = valid & (win < W)
        pos = win_c * F + pos_in
        return jnp.minimum(pos, L - 1), valid

    print(f"window searchsorted k={S}:  {bench(first_k_window, (occ,)):7.2f} ms")

    p1, v1 = first_k_topk(occ)
    p2, v2 = first_k_window(occ)
    agree = bool(jnp.all(v1 == v2) &
                 jnp.all(jnp.where(v1, p1, -1) == jnp.where(v2, p2, -1)))
    print(f"  agree: {agree}")

    # --- c) global compaction: flat cumsum+scatter vs window-level ---
    M = 65536
    mask_ns = jnp.zeros((N, S), bool).at[:, :13].set(True)  # ~13 valid/ray

    @jax.jit
    def compact_flat(mask):
        flat = mask.reshape(-1)
        cnt = jnp.cumsum(flat.astype(jnp.int32))
        dest = jnp.where(flat, cnt - 1, M)
        idx = jnp.zeros((M,), jnp.int32).at[dest].set(
            jnp.arange(N * S, dtype=jnp.int32), mode="drop")
        valid = jnp.arange(M, dtype=jnp.int32) < jnp.minimum(cnt[-1], M)
        return jnp.where(valid, idx, 0), valid

    print(f"compact flat scatter [{N*S}]->{M}: "
          f"{bench(compact_flat, (mask_ns,)):7.2f} ms")

    @jax.jit
    def compact_rays(mask):
        # per-ray counts (valid slots are a prefix) -> per-slot ray via
        # scatter of ray starts + cummax; slot rank = m - ray_base[ray]
        rcnt = jnp.sum(mask.astype(jnp.int32), axis=-1)  # [N]
        rbase = jnp.cumsum(rcnt) - rcnt  # [N] exclusive
        starts = jnp.zeros((M,), jnp.int32).at[rbase].max(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        ray = lax.cummax(starts)  # [M] — rays with 0 count never start
        mslot = jnp.arange(M, dtype=jnp.int32)
        rank = mslot - rbase[ray]
        valid = mslot < rcnt.sum()
        idx = ray * S + rank
        return jnp.where(valid, idx, 0), valid

    print(f"compact ray-scatter+cummax ->{M}: "
          f"{bench(compact_rays, (mask_ns,)):7.2f} ms")
    i1, va = compact_flat(mask_ns)
    i2, vb = compact_rays(mask_ns)
    print(f"  agree: {bool(jnp.all(va == vb) & jnp.all(jnp.where(va, i1, 0) == jnp.where(vb, i2, 0)))}")


if __name__ == "__main__":
    main()
