"""Micro-benchmark: first-S occupied-lattice compaction formulations (v5e).

The march's budget compaction `_compact_first_k(occ [N, L], S)` is a
lax.top_k over scores (a full row sort): traced 0.64 ms/step at
[4096, 440] -> 64 on the cascade config and ~0.6 at [4096, 1024] -> 64 on
the headline.  Candidate: a window-hierarchical formulation on the
march's native [N, W, F] block —

  1. per-window counts + exclusive base (cumsum over W)
  2. slot's window  w(s) = #(base <= s) - 1   (compare+reduce, [N, W, S])
  3. slot's window bits via a W-long where-chain of [N, F] slabs
  4. within-window offset by cumsum over F + argmax

Exactness vs _compact_first_k is asserted on random masks before timing.

Run: python tools/micro_compact.py [--W 40 --F 11 | --W 32 --F 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def hier_first_s(occ_wf, S):
    """First-S occupied positions of occ [N, W, F] flattened row-major.

    Returns (pos [N, S] i32 clamped, valid [N, S]) matching
    _compact_first_k(occ.reshape(N, W*F), S) on valid slots.
    """
    import jax.numpy as jnp

    N, W, F = occ_wf.shape
    cnt_w = jnp.sum(occ_wf.astype(jnp.int32), axis=-1)  # [N, W]
    csum = jnp.cumsum(cnt_w, axis=-1)
    base = csum - cnt_w  # exclusive
    s = jnp.arange(S, dtype=jnp.int32)
    # window containing slot s: the LAST w with base[w] <= s (ties from
    # zero-count windows resolve to the occupied one)
    wi = jnp.sum((base[:, :, None] <= s[None, None, :]).astype(jnp.int32),
                 axis=1) - 1  # [N, S]
    wi = jnp.clip(wi, 0, W - 1)
    # select base and bits of window wi via a W-long where-chain
    base_s = jnp.zeros((N, S), jnp.int32)
    bits_s = jnp.zeros((N, S, F), bool)
    for q in range(W):
        at = wi == q
        base_s = jnp.where(at, base[:, q, None], base_s)
        bits_s = jnp.where(at[..., None], occ_wf[:, None, q, :], bits_s)
    r = s[None, :] - base_s  # within-window rank
    c = jnp.cumsum(bits_s.astype(jnp.int32), axis=-1)
    hit = bits_s & (c == (r[..., None] + 1))
    f = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    valid = s[None, :] < csum[:, -1:]
    pos = jnp.clip(wi * F + f, 0, W * F - 1)
    return pos, valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--W", type=int, default=40)
    ap.add_argument("--F", type=int, default=11)
    ap.add_argument("--S", type=int, default=64)
    ap.add_argument("--occ", type=float, default=0.12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pvd_tpu.render.renderer import _compact_first_k

    N, W, F, S = args.N, args.W, args.F, args.S
    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.uniform(size=(N, W, F)) < args.occ)

    # exactness first
    pos_t, val_t = jax.jit(
        lambda m: _compact_first_k(m.reshape(N, W * F), S))(occ)
    pos_h, val_h = jax.jit(lambda m: hier_first_s(m, S))(occ)
    assert np.array_equal(np.asarray(val_t), np.asarray(val_h)), "valid!"
    vt = np.asarray(val_t)
    assert np.array_equal(np.asarray(pos_t)[vt], np.asarray(pos_h)[vt]), \
        "pos mismatch on valid slots"
    print("exactness OK")

    def timeit(name, fn):
        f = jax.jit(fn)
        r = f(occ)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        # force host readback (axon tunnel returns early otherwise)
        float(jnp.asarray(r[0]).sum())
        t0 = time.time()
        iters = 100
        for _ in range(iters):
            r = f(occ)
        float(jnp.asarray(r[0]).sum())
        dt = (time.time() - t0) / iters * 1e3
        print(f"{name:44s} {dt:7.3f} ms")
        return dt

    timeit("top_k _compact_first_k [N, W*F] -> S",
           lambda m: _compact_first_k(m.reshape(N, W * F), S))
    timeit("hierarchical window first-S",
           lambda m: hier_first_s(m, S))


if __name__ == "__main__":
    main()
