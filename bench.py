"""Benchmark: hash->vm distillation train-step throughput (rays/sec/chip).

Headline metric from BASELINE.md: >= 2 Mrays/sec/chip on TPU for hash->vm
distillation (train + render: every step renders the student AND the teacher
on the student's samples, then backprops the student).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax.default_backend() provides (the axon TPU in this
environment; CPU fallback works but is slow).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pvd_tpu.config import ModelSpec, PVDConfig, RenderSpec
    from pvd_tpu.engine.optim import build_optimizer, cosine_schedule
    from pvd_tpu.engine.train_steps import TrainState, make_distill_step
    from pvd_tpu.models import init_field
    from pvd_tpu.models.api import param_group_label, trainable_label
    from pvd_tpu.render import init_occupancy_state

    NUM_RAYS = 4096  # reference distill default (main_distill_mutual.py:56-61)
    MAX_SAMPLES = 32
    H, W = 800, 800
    ITERS = 30
    WARMUP = 5

    cfg = PVDConfig(
        num_rays=NUM_RAYS, max_samples=MAX_SAMPLES, grid_size=128,
        max_steps=1024, resolution0=300,
    )
    rspec = cfg.render_spec()
    spec_tea = ModelSpec(model_type="hash", compute_dtype="bfloat16",
                         hash_cell_levels=9)
    spec_stu = ModelSpec(model_type="vm", vm_resolution=(300, 300, 300), compute_dtype="bfloat16")

    k = jax.random.PRNGKey(0)
    params_tea = init_field(jax.random.fold_in(k, 0), spec_tea)
    params_stu = init_field(jax.random.fold_in(k, 1), spec_stu)

    occ = init_occupancy_state(rspec)
    # ~3% occupancy, typical of a converged Synthetic-NeRF grid
    occ = occ.replace(
        bitfield=jax.random.uniform(jax.random.fold_in(k, 2),
                                    occ.bitfield.shape) < 0.03
    )

    opt = build_optimizer(
        params_stu,
        label_fn=param_group_label(spec_stu),
        trainable_fn=trainable_label(spec_stu, ""),
        schedule_main=cosine_schedule(1e-2, 30000),
        schedule_lr2=cosine_schedule(1e-3, 30000),
    )
    state = TrainState(params=params_stu, opt_state=opt.init(params_stu),
                       occ=occ, step=jnp.int32(0))

    step_fn = make_distill_step(
        spec_stu, spec_tea, rspec, opt, cfg,
        intrinsics=(1111.0, 1111.0, W / 2, H / 2), H=H, W=W, stage=3,
    )

    # camera orbit pose (synthetic convention)
    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.ops.rays import nerf_matrix_to_ngp

    pose = jnp.asarray(nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0),
                                          scale=0.8))

    key = jax.random.PRNGKey(1)
    for i in range(WARMUP):
        key, kk = jax.random.split(key)
        state, logs = step_fn(state, params_tea, occ, pose, kk)
    # host readback forces full sync (block_until_ready can return early
    # through this environment's remote-TPU tunnel)
    float(logs["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        key, kk = jax.random.split(key)
        state, logs = step_fn(state, params_tea, occ, pose, kk)
    float(logs["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = NUM_RAYS * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "hash->vm distill train-step throughput "
                f"({jax.default_backend()}, {NUM_RAYS} rays/step, "
                f"S_max={MAX_SAMPLES})",
                "value": round(rays_per_sec, 1),
                "unit": "rays/sec/chip",
                "vs_baseline": round(rays_per_sec / 2.0e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
