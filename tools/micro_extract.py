"""Micro-benchmark: probe-mask bit-extraction formulations (v5e).

The march's word-select where-chain (renderer._super_mask_bit) runs on
[N, W, F]-shaped operands whose minor dim is F — 11 lanes of 128 on the
cascade config, 32 on the tuned config — wasting most of each vector
tile.  Candidates:

  A) current: chain on [N, W, F] (off [N, W, F, 3])
  B) lane-full: compute word_i/bit_i, reshape to [N, W*F] (free major
     merge), chain with per-q operands broadcast [N, W, 1] -> [N, W*F]
     inside the fusion
  C) chain length: only the first `nw_data` words (padded-row case)

Run: python tools/micro_extract.py [--W 96 --F 11 | --W 32 --F 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--W", type=int, default=96)
    ap.add_argument("--F", type=int, default=11)
    ap.add_argument("--side", type=int, default=16)
    ap.add_argument("--nw", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    N, W, F, side, nw = args.N, args.W, args.F, args.side, args.nw
    chain = side * (side // 2)
    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.integers(0, 2**32, (N, W, nw), dtype=np.uint32))
    off = jnp.asarray(rng.integers(0, side, (N, W, F, 3), dtype=np.int32))

    def timeit(name, fn, *a, iters=50):
        f = jax.jit(fn)
        out = f(*a)
        ref = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:46s} {dt:8.3f} ms  (sum {ref:.0f})", flush=True)

    def ex_A(masks, off):
        word_i = off[..., 2] * (side // 2) + (off[..., 1] >> 1)
        bit_i = (((off[..., 1] & 1) << 4) + off[..., 0]).astype(jnp.uint32)
        word = jnp.zeros(word_i.shape, jnp.uint32)
        for q in range(chain):
            word = jnp.where(word_i == q, masks[..., None, q], word)
        return ((word >> bit_i) & jnp.uint32(1)).astype(bool)

    def ex_B(masks, off):
        word_i = (off[..., 2] * (side // 2)
                  + (off[..., 1] >> 1)).reshape(N, W * F)
        bit_i = ((((off[..., 1] & 1) << 4) + off[..., 0])
                 .astype(jnp.uint32).reshape(N, W * F))
        word = jnp.zeros((N, W * F), jnp.uint32)
        for q in range(chain):
            mq = jnp.broadcast_to(masks[:, :, q:q + 1],
                                  (N, W, F)).reshape(N, W * F)
            word = jnp.where(word_i == q, mq, word)
        return ((word >> bit_i) & jnp.uint32(1)).astype(bool)

    print(f"N={N} W={W} F={F} side={side} nw={nw} chain={chain}")
    timeit("A: [N, W, F] chain", ex_A, masks, off)
    timeit("B: [N, W*F] lane-full chain", ex_B, masks, off)
    a = np.asarray(jax.jit(ex_A)(masks, off))
    b = np.asarray(jax.jit(ex_B)(masks, off)).reshape(N, W, F)
    print("B == A:", bool((a == b).all()))


if __name__ == "__main__":
    main()
