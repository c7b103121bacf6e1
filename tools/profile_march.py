"""Micro-benchmarks of march_rays internals on the TPU.

Separates: occupancy gathers (coarse+fine), _compact_first_k
(cumsum+searchsorted) vs a top_k formulation, and the take_along_axis
epilogue — to find where the 37.7ms march (vs its ~10ms gather-row
prediction) actually goes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N, L, S, F = 4096, 1024, 32, 8
    H = 128
    k = jax.random.PRNGKey(0)
    bitfield = jax.random.uniform(k, (H * H * H,)) < 0.03
    # [N, L] random positions (simulating lattice lookups)
    flat = jax.random.randint(jax.random.fold_in(k, 1), (N, L), 0, H ** 3)
    flat_c = flat[:, ::F]  # coarse probes
    mask_win = jax.random.uniform(jax.random.fold_in(k, 2), (N, L // F)) < 0.25
    mask_fine = jax.random.uniform(jax.random.fold_in(k, 3), (N, S * F)) < 0.25

    @jax.jit
    def occ_coarse(bitfield, flat_c):
        return bitfield[flat_c]

    @jax.jit
    def occ_fine(bitfield, flat):
        return bitfield[flat[:, : S * F]]

    print(f"occ gather coarse [N,{L//F}]: {timeit(occ_coarse, bitfield, flat_c):6.2f} ms "
          f"({N*(L//F)/1e6:.2f}M rows)")
    print(f"occ gather fine [N,{S*F}]:  {timeit(occ_fine, bitfield, flat):6.2f} ms "
          f"({N*S*F/1e6:.2f}M rows)")

    # packed-word variant: gather int32 words instead of bools
    words = jax.random.randint(jax.random.fold_in(k, 4), (H * H * H // 16,),
                               0, 2**31 - 1, dtype=jnp.int32)

    @jax.jit
    def occ_words(words, flat_c):
        w = words[flat_c // 16]
        return (w >> (flat_c % 16)) & 1

    print(f"occ word-gather coarse:     {timeit(occ_words, words, flat_c):6.2f} ms")

    # --- compaction variants on [N, L] -> first S ---
    from pvd_tpu.render.renderer import _compact_first_k

    @jax.jit
    def compact_search(mask):
        return _compact_first_k(mask, S)

    @jax.jit
    def compact_topk(mask):
        Lm = mask.shape[1]
        idx = jnp.arange(Lm, dtype=jnp.int32)
        # top_k of (Lm - idx) for True entries -> first S true indices
        score = jnp.where(mask, Lm - idx[None, :], 0)
        vals, _ = jax.lax.top_k(score, S)
        valid = vals > 0
        pos = jnp.where(valid, Lm - vals, Lm - 1)
        return pos, valid

    @jax.jit
    def compact_scatter(mask):
        Lm = mask.shape[1]
        cum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        dest = jnp.where(mask, cum - 1, S)  # S = out-of-range drop slot
        idx = jnp.broadcast_to(jnp.arange(Lm, dtype=jnp.int32)[None], mask.shape)
        out = jnp.full((mask.shape[0], S + 1), Lm - 1, jnp.int32)
        out = out.at[jnp.arange(mask.shape[0])[:, None], dest].set(
            idx, mode="drop")
        pos = out[:, :S]
        valid = jnp.arange(1, S + 1)[None, :] <= cum[:, -1:]
        return pos, valid

    m128 = mask_win
    m256 = mask_fine
    for name, m in (("[N,128]", m128), ("[N,256]", m256)):
        t1 = timeit(compact_search, m)
        t2 = timeit(compact_topk, m)
        t3 = timeit(compact_scatter, m)
        # correctness cross-check
        p1, v1 = compact_search(m)
        p2, v2 = compact_topk(m)
        p3, v3 = compact_scatter(m)
        ok2 = bool(jnp.all(v1 == v2) & jnp.all(jnp.where(v1, p1 == p2, True)))
        ok3 = bool(jnp.all(v1 == v3) & jnp.all(jnp.where(v1, p1 == p3, True)))
        print(f"compact {name}: searchsorted {t1:6.2f} | top_k {t2:6.2f} "
              f"(match={ok2}) | scatter {t3:6.2f} (match={ok3})")

    # --- full march as shipped ---
    from pvd_tpu.config import PVDConfig
    from pvd_tpu.ops.aabb import near_far_from_aabb
    from pvd_tpu.render import init_occupancy_state
    from pvd_tpu.render.occupancy import set_bitfield
    from pvd_tpu.render.renderer import march_rays

    cfg = PVDConfig(num_rays=N, max_samples=S, grid_size=H, max_steps=L)
    rspec = cfg.render_spec()
    occ = set_bitfield(init_occupancy_state(rspec), bitfield)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-0.1, 0.1, (N, 3)).astype(np.float32)
                    + np.array([0, 0, -2.5], np.float32))
    d_np = rng.normal(size=(N, 3)).astype(np.float32)
    d_np[:, 2] = np.abs(d_np[:, 2]) + 2.0
    d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=-1, keepdims=True))

    @jax.jit
    def full_march(bf, bfd, o, d):
        nears, fars = near_far_from_aabb(o, d, occ.aabb_train, rspec.min_near)
        return march_rays(bf, o, d, nears, fars, rspec,
                          perturb_key=jax.random.PRNGKey(1),
                          bitfield_dilated=bfd)

    print(f"full march_rays:            "
          f"{timeit(full_march, occ.bitfield, occ.bitfield_dilated, o, d):6.2f} ms")


if __name__ == "__main__":
    main()
