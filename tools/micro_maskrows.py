"""Gather-rate micro-bench for probe-mask row widths (run on the TPU).

Round-4 mask widening hypothesis: the v5e gather engine charges per ROW
for power-of-2 row widths (16B-256B ~193-210M rows/s, 512B ~256M even),
but a non-power-of-2 48B row measured 46M rows/s (round-3 session).
This validates the 9^3 mask geometry: 23 used words PADDED to 32
(128B rows) from a [C*H^3 ~ 4.2M, W] uint32 table at the MC march's
row count (N*W = 4096 * ceil(1024/5) = 840k rows/step).

Run: python tools/micro_maskrows.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def bench(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    k = jax.random.PRNGKey(0)
    rows_total = 2 * 128 ** 3 + 1  # the C=2 MC mask table
    for n_idx in (4096 * 205, 4096 * 342):
        idx = jax.random.randint(k, (n_idx,), 0, rows_total)
        for words in (4, 12, 23, 24, 32, 64, 128):
            table = jnp.zeros((rows_total, words), jnp.uint32)

            @jax.jit
            def g(t, i):
                return jnp.take(t, i, axis=0, mode="clip")

            ms = bench(g, (table, idx))
            print(f"gather {n_idx/1e6:.2f}M rows x {words*4:>4d}B "
                  f"from [{rows_total},{words}]: {ms:7.2f} ms = "
                  f"{n_idx/ms*1e3/1e6:6.0f}M rows/s")


if __name__ == "__main__":
    main()
