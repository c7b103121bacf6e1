"""Micro: jit input layout of a big gather table (v5e via axon).

The baked teacher table f32[~389K, 80] arrives at the compiled distill
step in layout {0,1} and the module copies it to {1,0} EVERY step
(copy.575, 0.50 ms, 249 MB): attach_packed's host round-trip re-places
the buffer row-major, but jit's layout assignment still declares the
parameter {0,1}.  This micro isolates who picks {0,1}: the eager bake
graph, the host upload, or jit's AUTO input-layout choice — and times
the gather under (a) eager-built table, (b) np-round-trip table,
(c) donate/pinned-layout variants.

Run: python tools/micro_layout.py
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

    R, C, M = 389024, 80, 131072
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, R, M, dtype=np.int32))

    # (a) table committed by an eager graph (like build_baked_dense)
    host = rng.normal(size=(R, C)).astype(np.float32)
    eager_tab = jnp.concatenate(
        [jnp.asarray(host[:, :40]), jnp.asarray(host[:, 40:])], axis=1) * 1.0
    # (b) host round-trip (attach_packed._default_layout)
    rt_tab = jnp.asarray(np.asarray(eager_tab))

    def gather_sum(tab, idx):
        return jnp.take(tab, idx, axis=0).sum()

    f = jax.jit(gather_sum)

    def layouts(tab):
        try:
            lowered = f.lower(tab, idx)
            comp = lowered.compile()
            try:
                il = comp.input_layouts
            except AttributeError:
                il = getattr(comp, "_executable", None)
            return str(il)[:160]
        except Exception as e:
            return f"(layout introspection unavailable: {e})"

    def timeit(name, tab):
        float(f(tab, idx))  # compile+warm
        float(f(tab, idx))
        t0 = time.perf_counter()
        for _ in range(50):
            r = f(tab, idx)
        float(r)
        dt = (time.perf_counter() - t0) / 50 * 1e3
        print(f"{name:34s} {dt:7.3f} ms   layouts: {layouts(tab)}")

    print(f"table [{R},{C}] f32, gather {M} rows")
    print("arg layout (a eager):", eager_tab.format
          if hasattr(eager_tab, "format") else "n/a")
    timeit("(a) eager-built table", eager_tab)
    timeit("(b) np-round-trip table", rt_tab)
    # (c) explicit device_put with a pinned row-major layout, if the
    # layout API exists in this jax
    try:
        from jax.experimental.layout import Format, Layout  # type: ignore

        try:
            dll = Layout(major_to_minor=(0, 1))
        except TypeError:
            dll = Layout((0, 1))
        pinned = jax.device_put(np.asarray(host), Format(dll))
        timeit("(c) device_put pinned {1,0}", pinned)
    except Exception as e:
        print(f"(c) layout API unavailable: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
