"""Roofline breakdown of the hash->vm distill step on the real TPU.

Times each subsystem separately (march, student fwd, teacher fwd, full
fwd, full step) and reports gather-rows/step estimates against the
measured ~160M rows/s TPU gather ceiling (see CLAUDE.md / README).

Run: python tools/profile_step.py [--rays 4096] [--smax 32]
All timings force a host readback (block_until_ready returns early
through the axon tunnel).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).sum())


def bench_fn(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--smax", type=int, default=32)
    ap.add_argument("--cell_levels", type=int, default=9)
    ap.add_argument("--res0", type=int, default=300)
    ap.add_argument("--spr", type=float, default=6.0,
                    help="samples_per_ray budget (tuned prod config: 6)")
    args = ap.parse_args()

    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pvd_tpu.config import ModelSpec, PVDConfig
    from pvd_tpu.engine.optim import build_optimizer, cosine_schedule
    from pvd_tpu.engine.train_steps import TrainState, make_distill_step
    from pvd_tpu.models import init_field
    from pvd_tpu.models.api import field_forward, param_group_label, trainable_label
    from pvd_tpu.render import init_occupancy_state
    from pvd_tpu.render.occupancy import set_bitfield
    from pvd_tpu.render.renderer import march_rays, render_rays
    from pvd_tpu.ops.aabb import near_far_from_aabb
    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.ops.rays import get_rays, nerf_matrix_to_ngp

    N, S = args.rays, args.smax
    cfg = PVDConfig(num_rays=N, max_samples=S, grid_size=128, max_steps=1024,
                    resolution0=args.res0, samples_per_ray=args.spr,
                    autotune_budget=False)
    rspec = cfg.render_spec()
    spec_tea = ModelSpec(model_type="hash", compute_dtype="bfloat16",
                         hash_cell_levels=args.cell_levels)
    spec_stu = ModelSpec(model_type="vm", vm_resolution=(args.res0,) * 3,
                         compute_dtype="bfloat16")

    k = jax.random.PRNGKey(0)
    params_tea = init_field(jax.random.fold_in(k, 0), spec_tea)
    from pvd_tpu.models.hash_field import attach_packed

    params_tea = attach_packed(params_tea, spec_tea)
    params_stu = init_field(jax.random.fold_in(k, 1), spec_stu)
    occ = init_occupancy_state(rspec)
    occ = set_bitfield(
        occ, jax.random.uniform(jax.random.fold_in(k, 2),
                                occ.bitfield.shape) < 0.03)

    pose = jnp.asarray(nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0),
                                          scale=0.8))
    intr = (1111.0, 1111.0, 400.0, 400.0)
    rays = get_rays(jax.random.PRNGKey(7), pose[None], intr, 800, 800, N)
    o, d = rays["rays_o"][0], rays["rays_d"][0]

    print(f"backend={jax.default_backend()} rays={N} S_max={S}")

    # --- march only ---
    @jax.jit
    def run_march(bitfield, bitfield_d, nm, o, d):
        nears, fars = near_far_from_aabb(o, d, occ.aabb_train, rspec.min_near)
        return march_rays(bitfield, o, d, nears, fars, rspec,
                          perturb_key=jax.random.PRNGKey(1),
                          bitfield_dilated=bitfield_d, neighbor_masks=nm)

    march_args = (occ.bitfield, occ.bitfield_dilated, occ.neighbor_masks,
                  o, d)
    ms = bench_fn(run_march, march_args)
    samples = run_march(*march_args)
    mask_frac = float(samples.mask.mean())
    budget_hit = float(samples.mask[:, -1].mean())
    print(f"march_only: {ms:7.2f} ms   valid_frac={mask_frac:.3f} "
          f"budget_hit={budget_hit:.3f}")

    # rows: coarse probes + fine window points
    Lc = rspec.max_steps // rspec.coarse_stride
    rows_coarse = N * Lc
    rows_fine = N * S * rspec.coarse_stride
    print(f"  est gather rows: coarse={rows_coarse/1e6:.2f}M "
          f"fine={rows_fine/1e6:.2f}M  -> {(rows_coarse+rows_fine)/0.16e9*1e3:.1f} ms @160M rows/s")

    # field nets run on the COMPACTED budget, not N*S padded samples
    M = rspec.sample_budget(N) or N * S
    print(f"compacted budget M={M}")
    xyz = jnp.zeros((M, 3))
    dirs = jnp.zeros((M, 3))

    # --- student forward only ---
    @jax.jit
    def stu_fwd(params, xyz, dirs):
        out = field_forward(params, spec_stu, xyz, dirs, occ.aabb_train, True)
        return out.sigma, out.rgb

    ms = bench_fn(stu_fwd, (params_stu, xyz, dirs))
    print(f"stu_fwd ({M} pts): {ms:7.2f} ms   "
          f"(6 rows/pt = {M*6/1e6:.2f}M rows -> {M*6/0.16e9*1e3:.1f} ms)")

    # --- teacher forward only ---
    @jax.jit
    def tea_fwd(params, xyz, dirs):
        out = field_forward(params, spec_tea, xyz, dirs, occ.aabb_train, True)
        return out.sigma, out.rgb

    ms = bench_fn(tea_fwd, (params_tea, xyz, dirs))
    print(f"tea_fwd ({M} pts): {ms:7.2f} ms   "
          f"(14 rows/pt = {M*14/1e6:.2f}M rows -> {M*14/0.16e9*1e3:.1f} ms)")

    # --- student fwd+bwd (render-only grad) ---
    @jax.jit
    def stu_fwd_bwd(params, xyz, dirs):
        def f(p):
            out = field_forward(p, spec_stu, xyz, dirs, occ.aabb_train, True)
            return jnp.sum(out.sigma) + jnp.sum(out.rgb)

        return jax.grad(f)(params)

    ms = bench_fn(stu_fwd_bwd, (params_stu, xyz, dirs))
    print(f"stu_fwd+bwd: {ms:7.2f} ms")

    # --- full render (student, train mode) ---
    @jax.jit
    def full_render(params, o, d):
        out = render_rays(params, spec_stu, rspec, occ, o, d, training=True,
                          bg_color=1.0, perturb_key=jax.random.PRNGKey(1))
        return out["image"]

    ms = bench_fn(full_render, (params_stu, o, d))
    print(f"student_full_render: {ms:7.2f} ms")

    # --- full distill step ---
    opt = build_optimizer(
        params_stu, label_fn=param_group_label(spec_stu),
        trainable_fn=trainable_label(spec_stu, ""),
        schedule_main=cosine_schedule(1e-2, 30000),
        schedule_lr2=cosine_schedule(1e-3, 30000))
    state = TrainState(params=params_stu, opt_state=opt.init(params_stu),
                       occ=occ, step=jnp.int32(0))
    step_fn = make_distill_step(spec_stu, spec_tea, rspec, opt, cfg,
                                intrinsics=intr, H=800, W=800, stage=3)

    def run_step(state, key):
        return step_fn(state, params_tea, occ, pose, key)

    keys = jax.random.split(jax.random.PRNGKey(3), 40)
    for i in range(3):
        state, logs = run_step(state, keys[i])
    sync(logs["loss"])
    t0 = time.perf_counter()
    for i in range(20):
        state, logs = run_step(state, keys[3 + i])
    sync(logs["loss"])
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"full_distill_step: {ms:7.2f} ms  -> {N/ms*1e3:,.0f} rays/s")


if __name__ == "__main__":
    main()
