"""Stage-by-stage breakdown of the EXACT bench.py configuration.

Times march / compaction / student fwd / teacher fwd / composite /
loss fwd / full step on the clustered object-like occupancy grid, at an
arbitrary (S_max, samples_per_ray) point, so autotune escalation can be
cost-attributed.  Run: python tools/profile_bench.py [--smax 96 --spr 16].
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def bench_fn(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--smax", type=int, default=96)
    ap.add_argument("--spr", type=float, default=16.0)
    args = ap.parse_args()

    from bench import object_like_bitfield
    from pvd_tpu.config import ModelSpec, PVDConfig
    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.engine.optim import build_optimizer, cosine_schedule
    from pvd_tpu.engine.train_steps import TrainState, make_distill_step
    from pvd_tpu.models import init_field
    from pvd_tpu.models.api import field_forward, param_group_label, \
        trainable_label
    from pvd_tpu.models.hash_field import attach_packed
    from pvd_tpu.ops.aabb import near_far_from_aabb
    from pvd_tpu.ops.rays import get_rays, nerf_matrix_to_ngp
    from pvd_tpu.render import init_occupancy_state
    from pvd_tpu.render.occupancy import set_bitfield
    from pvd_tpu.render.renderer import (
        compact_samples, march_rays, render_rays,
    )

    N = args.rays
    cfg = PVDConfig(num_rays=N, grid_size=128, max_steps=1024,
                    resolution0=300, max_samples=args.smax,
                    samples_per_ray=args.spr)
    rspec = cfg.render_spec()
    spec_tea = ModelSpec(model_type="hash", compute_dtype="bfloat16",
                         hash_cell_levels=9)
    spec_stu = ModelSpec(model_type="vm", vm_resolution=(300, 300, 300),
                         compute_dtype="bfloat16")

    k = jax.random.PRNGKey(0)
    params_tea = attach_packed(init_field(jax.random.fold_in(k, 0), spec_tea),
                               spec_tea)
    params_stu = init_field(jax.random.fold_in(k, 1), spec_stu)
    occ = set_bitfield(init_occupancy_state(rspec),
                       jnp.asarray(object_like_bitfield(rspec.grid_size)))

    pose = jnp.asarray(nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0),
                                          scale=0.8))
    intr = (1111.0, 1111.0, 400.0, 400.0)
    rays = get_rays(jax.random.PRNGKey(7), pose[None], intr, 800, 800, N)
    o, d = rays["rays_o"][0], rays["rays_d"][0]
    budget = rspec.sample_budget(N)
    print(f"backend={jax.default_backend()} rays={N} S_max={args.smax} "
          f"spr={args.spr} budget={budget} "
          f"probe_stride={rspec.effective_probe_stride}")

    # --- march ---
    @jax.jit
    def run_march(nm, bf, bfd, o, d):
        nears, fars = near_far_from_aabb(o, d, occ.aabb_train, rspec.min_near)
        return march_rays(bf, o, d, nears, fars, rspec,
                          perturb_key=jax.random.PRNGKey(1),
                          bitfield_dilated=bfd, neighbor_masks=nm)

    margs = (occ.neighbor_masks, occ.bitfield, occ.bitfield_dilated, o, d)
    ms = bench_fn(run_march, margs)
    samples = run_march(*margs)
    mask_frac = float(samples.mask.mean())
    print(f"march:      {ms:7.2f} ms  valid_frac={mask_frac:.3f} "
          f"budget_hit={float(samples.mask[:, -1].mean()):.3f} "
          f"mean_valid/ray={mask_frac * args.smax:.1f}")

    # --- global compaction ---
    @jax.jit
    def run_compact(mask):
        return compact_samples(mask, budget)

    ms = bench_fn(run_compact, (samples.mask,))
    ci = run_compact(samples.mask)
    print(f"compact:    {ms:7.2f} ms  total_valid={int(ci.total)} "
          f"budget={budget}")

    # --- field forwards on the compacted block ---
    xyz = jnp.zeros((budget, 3))
    dirs = jnp.zeros((budget, 3))

    @jax.jit
    def stu_fwd(params, xyz, dirs):
        out = field_forward(params, spec_stu, xyz, dirs, occ.aabb_train, True)
        return out.sigma, out.rgb

    print(f"stu_fwd ({budget} pts): {bench_fn(stu_fwd, (params_stu, xyz, dirs)):7.2f} ms")

    @jax.jit
    def tea_fwd(params, xyz, dirs):
        out = field_forward(params, spec_tea, xyz, dirs, occ.aabb_train, True)
        return out.sigma, out.rgb

    print(f"tea_fwd ({budget} pts): {bench_fn(tea_fwd, (params_tea, xyz, dirs)):7.2f} ms")

    @jax.jit
    def stu_fwd_bwd(params, xyz, dirs):
        def f(p):
            out = field_forward(p, spec_stu, xyz, dirs, occ.aabb_train, True)
            return jnp.sum(out.sigma) + jnp.sum(out.rgb)

        return jax.grad(f)(params)

    print(f"stu_fwd+bwd: {bench_fn(stu_fwd_bwd, (params_stu, xyz, dirs)):7.2f} ms")

    # --- student full render fwd (march+compact+fields+composite) ---
    @jax.jit
    def full_render(params, o, d):
        out = render_rays(params, spec_stu, rspec, occ, o, d, training=True,
                          bg_color=1.0, perturb_key=jax.random.PRNGKey(1))
        return out["image"]

    ms_render = bench_fn(full_render, (params_stu, o, d))
    print(f"stu_full_render_fwd: {ms_render:7.2f} ms")

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

    keys = jax.random.split(jax.random.PRNGKey(3), 40)
    for i in range(3):
        state, logs = step_fn(state, params_tea, occ, pose, keys[i])
    sync(logs["loss"])
    t0 = time.perf_counter()
    for i in range(20):
        state, logs = step_fn(state, params_tea, occ, pose, keys[3 + i])
    sync(logs["loss"])
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"full_distill_step: {ms:7.2f} ms  -> {N/ms*1e3:,.0f} rays/s")


if __name__ == "__main__":
    main()
