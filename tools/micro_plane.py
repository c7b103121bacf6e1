"""Micro-benchmark: VM plane-sample backward formulations (v5e).

The tuned step spends ~3.3 ms/step at vm_field._plane_sample4 (fwd
4-corner gather + bwd wide scatter + 3 shifted lane folds, x3 branches).
Candidates for the bwd fold:
  A) current: concat(zeros(off, R), scratch_blk) x3 adds
  B) jnp.pad formulation (same math, pad instead of concat)
  C) 2-D reshape [H, W, 4R] with 2-D pads (one fused pass?)
  D) bf16 scratch (halve fold bytes; grads cast back to f32)
Plus fwd reference: 4-corner gather alone.

Run: python tools/micro_plane.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    H = W = 300
    R = 64
    N = 24576
    HW = H * W
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((HW, R)), jnp.float32)
    i = jnp.asarray(rng.integers(0, (H - 1) * W - 2, N), jnp.int32)
    w4 = jnp.asarray(rng.random((4, N)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((N, R)), jnp.float32)

    def timeit(name, fn, *args, iters=50):
        f = jax.jit(fn)
        out = f(*args)
        ref = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(
            jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(
            jnp.float32).sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:40s} {dt:8.3f} ms   (sum {ref:.1f})")

    def fwd(v, i, w4):
        rows = jnp.concatenate([i, i + 1, i + W, i + W + 1], axis=0)
        vals = jnp.take(v, rows, axis=0, mode="clip").reshape(4, -1, R)
        return jnp.sum(vals * w4[..., None], axis=0)

    def scatter_only(i, w4, g):
        u = w4.T[:, :, None] * g[:, None, :]
        u_wide = u.reshape(N, 4 * R)
        return jnp.zeros((HW, 4 * R), jnp.float32).at[i].add(
            u_wide, mode="drop")

    def bwd_A(i, w4, g):
        scratch = scatter_only(i, w4, g)
        g_v = scratch[:, :R]
        for k, off in ((1, 1), (2, W), (3, W + 1)):
            blk = scratch[: HW - off, k * R: (k + 1) * R]
            g_v = g_v + jnp.concatenate(
                [jnp.zeros((off, R), blk.dtype), blk], axis=0)
        return g_v

    def bwd_B(i, w4, g):
        scratch = scatter_only(i, w4, g)
        g_v = scratch[:, :R]
        for k, off in ((1, 1), (2, W), (3, W + 1)):
            blk = scratch[: HW - off, k * R: (k + 1) * R]
            g_v = g_v + jnp.pad(blk, ((off, 0), (0, 0)))
        return g_v

    def bwd_C(i, w4, g):
        scratch = scatter_only(i, w4, g).reshape(H, W, 4, R)
        s0 = scratch[:, :, 0]
        s1 = jnp.pad(scratch[:, : W - 1, 1], ((0, 0), (1, 0), (0, 0)))
        s2 = jnp.pad(scratch[: H - 1, :, 2], ((1, 0), (0, 0), (0, 0)))
        s3 = jnp.pad(scratch[: H - 1, : W - 1, 3],
                     ((1, 0), (1, 0), (0, 0)))
        return (s0 + s1 + s2 + s3).reshape(HW, R)

    def bwd_D(i, w4, g):
        u = (w4.T[:, :, None] * g[:, None, :]).astype(jnp.bfloat16)
        u_wide = u.reshape(N, 4 * R)
        scratch = jnp.zeros((HW, 4 * R), jnp.bfloat16).at[i].add(
            u_wide, mode="drop")
        g_v = scratch[:, :R].astype(jnp.float32)
        for k, off in ((1, 1), (2, W), (3, W + 1)):
            blk = scratch[: HW - off, k * R: (k + 1) * R]
            g_v = g_v + jnp.pad(blk, ((off, 0), (0, 0))).astype(jnp.float32)
        return g_v

    def fold_only_B(scratch):
        g_v = scratch[:, :R]
        for k, off in ((1, 1), (2, W), (3, W + 1)):
            blk = scratch[: HW - off, k * R: (k + 1) * R]
            g_v = g_v + jnp.pad(blk, ((off, 0), (0, 0)))
        return g_v

    def bwd_E(i, w4, g):
        # dy-split: TWO N-row update blocks (rows i and i+W) into a
        # [HW, 2R] scratch as ONE 2N-row scatter; single off=1 fold
        u0 = jnp.concatenate(
            [w4[0][:, None] * g, w4[1][:, None] * g], axis=1)  # dy=0: dx 0,1
        u1 = jnp.concatenate(
            [w4[2][:, None] * g, w4[3][:, None] * g], axis=1)  # dy=1
        rows = jnp.concatenate([i, i + W], axis=0)
        u = jnp.concatenate([u0, u1], axis=0)  # [2N, 2R]
        scratch = jnp.zeros((HW, 2 * R), jnp.float32).at[rows].add(
            u, mode="drop")
        return scratch[:, :R] + jnp.pad(scratch[: HW - 1, R:],
                                        ((1, 0), (0, 0)))

    def bwd_F(i, w4, g):
        # N-row wide scatter, then 2-stage fold: ONE off=1 pad applied to
        # the [HW, 2R]-paired view (folds k=1->k=0 and k=3->k=2 with the
        # same shift in one kernel), then the aligned off=W fold
        scratch = scatter_only(i, w4, g)
        lo = scratch[:, : 2 * R]   # corners (0,0),(1,0) at rows i, i+1
        hi = scratch[:, 2 * R:]    # corners (0,1),(1,1) at rows i+W, i+W+1
        # pair-fold dx: [HW, 2R] -> [HW, R] with one off=1 shift each
        lo_f = lo[:, :R] + jnp.pad(lo[: HW - 1, R:], ((1, 0), (0, 0)))
        hi_f = hi[:, :R] + jnp.pad(hi[: HW - 1, R:], ((1, 0), (0, 0)))
        return lo_f + jnp.pad(hi_f[: HW - W], ((W, 0), (0, 0)))

    def bwd_G(i, w4, g):
        # chained per-corner scatters into ONE [HW, R] buffer with
        # PRE-SHIFTED indices -- no folds at all, 4N update rows
        out = jnp.zeros((HW, R), jnp.float32)
        for k, off in ((0, 0), (1, 1), (2, W), (3, W + 1)):
            out = out.at[i + off].add(w4[k][:, None] * g, mode="drop")
        return out

    def bwd_I(i, w4, g):
        # N-row scatter + 2x2 CONV fold on the MXU: the 4 corner blocks
        # of the [H, W, 4R] scratch fold into [H, W, R] as a correlation
        # with a constant 0/1 kernel (tap (1-dy, 1-dx) selects block
        # dy*2+dx), so the three shifted adds become ONE conv dispatch
        from jax import lax as _lax

        scratch = scatter_only(i, w4, g).reshape(1, H, W, 4 * R)
        ker = np.zeros((2, 2, 4 * R, R), np.float32)
        for k in range(4):
            dy, dx = k >> 1, k & 1
            for r in range(R):
                ker[1 - dy, 1 - dx, k * R + r, r] = 1.0
        out = _lax.conv_general_dilated(
            scratch, jnp.asarray(ker), window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.reshape(HW, R)

    def bwd_H(i, w4, g):
        # ONE 4N-row scatter with pre-shifted indices (no folds)
        rows = jnp.concatenate([i, i + 1, i + W, i + W + 1], axis=0)
        u = (w4[:, :, None] * g[None]).reshape(4 * N, R)
        return jnp.zeros((HW, R), jnp.float32).at[rows].add(u, mode="drop")

    def scatter_2n(rows, u):
        return jnp.zeros((HW, 2 * R), jnp.float32).at[rows].add(
            u, mode="drop")

    # does the scatter engine charge for DROPPED (OOB) update rows?  If
    # not, merging duplicate-cell updates (ray-coherent samples) would cut
    # the per-row cost ~2x by pointing merged-away rows OOB.
    rows_all = jnp.concatenate([i, i + W], axis=0)
    u2 = jnp.asarray(rng.standard_normal((2 * N, 2 * R)), jnp.float32)
    half_oob = jnp.where(jnp.arange(2 * N) % 2 == 0, rows_all, HW + 1)
    all_oob = jnp.full((2 * N,), HW + 1, jnp.int32)
    timeit("scatter 2N rows, all valid", scatter_2n, rows_all, u2)
    timeit("scatter 2N rows, half OOB", scatter_2n, half_oob, u2)
    timeit("scatter 2N rows, all OOB", scatter_2n, all_oob, u2)

    timeit("fwd: 4-corner gather", fwd, v, i, w4)
    sc = jax.jit(scatter_only)(i, w4, g)
    timeit("bwd scatter only (no folds)", scatter_only, i, w4, g)
    timeit("bwd folds only (pad, on scratch)", fold_only_B, sc)
    timeit("bwd A: concat-zeros folds", bwd_A, i, w4, g)
    timeit("bwd B: pad folds (current)", bwd_B, i, w4, g)
    timeit("bwd C: 2-D reshape + pads", bwd_C, i, w4, g)
    timeit("bwd D: bf16 scratch + pad folds", bwd_D, i, w4, g)
    timeit("bwd E: 2N-row dy-split scatter", bwd_E, i, w4, g)
    timeit("bwd F: 2-stage paired fold", bwd_F, i, w4, g)
    timeit("bwd G: 4x chained N-row scatters", bwd_G, i, w4, g)
    timeit("bwd H: one 4N-row scatter", bwd_H, i, w4, g)
    timeit("bwd I: N-row scatter + 2x2 conv fold", bwd_I, i, w4, g)
    # consistency
    a = jax.jit(bwd_A)(i, w4, g)
    for nm, fn in (("B", bwd_B), ("C", bwd_C), ("E", bwd_E), ("F", bwd_F),
                   ("G", bwd_G), ("H", bwd_H), ("I", bwd_I)):
        b = jax.jit(fn)(i, w4, g)
        print(f"A vs {nm} max|d|: {float(jnp.abs(a - b).max()):.2e}")


if __name__ == "__main__":
    main()
