"""Micro-benchmark: overlapping-slice gathers for the VM plane sampler.

The bilinear plane sample needs 4 corner rows (i, i+1, i+W, i+W+1) of a
[H*W, R] table; rows (i, i+1) are CONTIGUOUS in memory, so a [2, R]
slice-gather starting at row i fetches a corner PAIR in one descriptor —
2 slices per point instead of 4 rows, if the engine moves 2R-wide slices
at its row rate.  Candidates:

  A) 4-row flat gather (current production, _plane_sample4)
  B) 2x [2,R]-slice gather from the [HW, R] 2-D view (lax.gather,
     slice_sizes=(2, R))
  C) 2x 2R-wide flat gather from an [HW*R] 1-D view at offsets i*R
     (slice_sizes=(2R,)) — same bytes, 1-D descriptor
  D) ONE [2, 2R]-slice gather from an [HW/W, W*R]... not expressible;
     instead: one [N] gather of [2,R] at i plus one at i+W (== B)
  E) scatter side: .at[(i,0)].add([N,2,R]) 2-D overlapping-window scatter
     vs the current 2N-row wide scatter

Run: python tools/micro_slice.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    H = W = 300
    R = 64
    N = 24576
    HW = H * W
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((HW, R)), jnp.float32)
    vflat = v.reshape(-1)
    i = jnp.asarray(rng.integers(0, (H - 2) * W - 2, N), jnp.int32)
    w4 = jnp.asarray(rng.random((4, N)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((N, R)), jnp.float32)

    def timeit(name, fn, *args, iters=100):
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
        print(f"{name:44s} {dt:8.3f} ms   (sum {ref:.1f})", flush=True)
        return dt

    # A: current 4-row gather
    def fwd_A(v, i, w4):
        rows = jnp.concatenate([i, i + 1, i + W, i + W + 1], axis=0)
        vals = jnp.take(v, rows, axis=0, mode="clip").reshape(4, -1, R)
        return jnp.sum(vals * w4[..., None], axis=0)

    # B: two [2, R]-slice gathers (corner pairs)
    def pair_gather_2d(v, starts):
        # starts: [N] row index; returns [N, 2, R]
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))
        return lax.gather(v, starts[:, None], dn, slice_sizes=(2, R),
                          mode=lax.GatherScatterMode.CLIP)

    def fwd_B(v, i, w4):
        lo = pair_gather_2d(v, i)          # rows i, i+1
        hi = pair_gather_2d(v, i + W)      # rows i+W, i+W+1
        vals = jnp.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], axis=0)
        return jnp.sum(vals * w4[..., None], axis=0)

    # C: 2R-wide flat slices at byte offsets i*R
    def pair_gather_flat(vflat, starts):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,))
        return lax.gather(vflat, (starts * R)[:, None], dn,
                          slice_sizes=(2 * R,),
                          mode=lax.GatherScatterMode.CLIP)

    def fwd_C(vflat, i, w4):
        lo = pair_gather_flat(vflat, i).reshape(-1, 2, R)
        hi = pair_gather_flat(vflat, i + W).reshape(-1, 2, R)
        vals = jnp.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], axis=0)
        return jnp.sum(vals * w4[..., None], axis=0)

    # gather-only references (isolate the engine rate)
    def gA(v, i):
        rows = jnp.concatenate([i, i + 1, i + W, i + W + 1], axis=0)
        return jnp.take(v, rows, axis=0, mode="clip")

    def gB(v, i):
        return pair_gather_2d(v, i), pair_gather_2d(v, i + W)

    def gC(vflat, i):
        return pair_gather_flat(vflat, i), pair_gather_flat(vflat, i + W)

    # E: scatter variants
    def sc_cur(i, w4, g):
        # current production shape: dy-split 2N-row scatter of [*, 2R]
        u01 = jnp.concatenate(
            [w4[0, :, None] * g, w4[1, :, None] * g], axis=1)  # [N, 2R]
        u23 = jnp.concatenate(
            [w4[2, :, None] * g, w4[3, :, None] * g], axis=1)
        rows = jnp.concatenate([i, i + W], axis=0)
        upd = jnp.concatenate([u01, u23], axis=0)  # [2N, 2R]
        return jnp.zeros((HW, 2 * R), jnp.float32).at[rows].add(
            upd, mode="drop")

    def sc_win(i, w4, g):
        # overlapping [2, R] window scatter-add at (i, 0) and (i+W, 0)
        u = jnp.stack([w4[0, :, None] * g, w4[1, :, None] * g], axis=1)
        u2 = jnp.stack([w4[2, :, None] * g, w4[3, :, None] * g], axis=1)
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))
        z = jnp.zeros((HW, R), jnp.float32)
        z = lax.scatter_add(z, i[:, None], u, dn,
                            mode=lax.GatherScatterMode.CLIP)
        return lax.scatter_add(z, (i + W)[:, None], u2, dn,
                               mode=lax.GatherScatterMode.CLIP)

    def sc_win_flat(i, w4, g):
        # overlapping 2R-wide flat-window scatter at offsets i*R
        u = jnp.concatenate(
            [w4[0, :, None] * g, w4[1, :, None] * g], axis=1)  # [N, 2R]
        u2 = jnp.concatenate(
            [w4[2, :, None] * g, w4[3, :, None] * g], axis=1)
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))
        z = jnp.zeros((HW * R,), jnp.float32)
        z = lax.scatter_add(z, (i * R)[:, None], u, dn,
                            mode=lax.GatherScatterMode.CLIP)
        return lax.scatter_add(z, ((i + W) * R)[:, None], u2, dn,
                               mode=lax.GatherScatterMode.CLIP)

    print(f"N={N} table [{HW}, {R}] f32 ({HW*R*4/1e6:.0f} MB)")
    timeit("fwd A: 4-row flat gather + wsum", fwd_A, v, i, w4)
    timeit("fwd B: 2x [2,R]-slice gather + wsum", fwd_B, v, i, w4)
    timeit("fwd C: 2x 2R-flat-slice gather + wsum", fwd_C, vflat, i, w4)
    timeit("gather A only (4N rows)", gA, v, i)
    timeit("gather B only (2N [2,R] slices)", gB, v, i)
    timeit("gather C only (2N 2R slices)", gC, vflat, i)
    timeit("bwd cur: 2N-row wide scatter", sc_cur, i, w4, g, iters=50)
    timeit("bwd win: 2x [2,R]-window scatter", sc_win, i, w4, g, iters=50)
    timeit("bwd winflat: 2x 2R-window scatter", sc_win_flat, i, w4, g,
           iters=50)

    # numeric check: B/C == A
    a = np.asarray(jax.jit(fwd_A)(v, i, w4))
    b = np.asarray(jax.jit(fwd_B)(v, i, w4))
    c = np.asarray(jax.jit(fwd_C)(vflat, i, w4))
    print("max |B-A|:", np.abs(b - a).max(), " max |C-A|:",
          np.abs(c - a).max())


if __name__ == "__main__":
    main()
