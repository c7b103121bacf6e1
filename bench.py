"""Benchmark: hash->vm distillation train-step throughput (rays/sec/chip).

Headline metric from BASELINE.md: >= 2 Mrays/sec/chip on TPU for hash->vm
distillation (train + render: every step renders the student AND the teacher
on the student's samples, then backprops the student).

Measured at the TUNED production config (4096 rays/step — the reference
distill default, main_distill_mutual.py:56-61 — S_max=64, global sample
budget 8/ray; within 0.03 dB of uncompacted S_max=96 in the distill
quality A/B, see STATUS.md) on a clustered occupancy grid shaped like a
converged Synthetic-NeRF scene (a shell-and-blobs object at ~4%
occupancy), not a uniform-random bitfield.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax.default_backend() provides (the axon TPU in this
environment; CPU fallback works but is slow).
"""

import json
import time

import numpy as np


def object_like_bitfield(H: int) -> np.ndarray:
    """Deterministic ~4% occupancy clustered like a trained object grid:
    a thick spherical shell plus a few solid blobs near the center."""
    g = np.zeros((H, H, H), bool)
    ax = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    g |= (r > 0.42) & (r < 0.5)  # shell
    rng = np.random.default_rng(7)
    for _ in range(6):  # interior blobs
        c = rng.uniform(-0.3, 0.3, 3)
        rad = rng.uniform(0.08, 0.16)
        g |= ((X - c[0]) ** 2 + (Y - c[1]) ** 2 + (Z - c[2]) ** 2) < rad**2
    return g.reshape(-1)


def main():
    import jax
    import jax.numpy as jnp

    from pvd_tpu.config import ModelSpec, PVDConfig
    from pvd_tpu.engine.optim import build_optimizer, cosine_schedule
    from pvd_tpu.engine.train_steps import TrainState, make_distill_step
    from pvd_tpu.models import init_field
    from pvd_tpu.models.api import param_group_label, trainable_label
    from pvd_tpu.models.hash_field import attach_packed
    from pvd_tpu.render import init_occupancy_state
    from pvd_tpu.render.occupancy import set_bitfield

    NUM_RAYS = 4096  # reference distill default (main_distill_mutual.py:56-61)
    H, W = 800, 800
    ITERS = 30
    WARMUP = 5

    # tuned production distill config: S_max=64, 8 samples/ray budget —
    # quality-justified by the A/B sweep (teacher 30.53 dB; 2000-iter
    # hash->vm students: base autotuned 30.92, S64/spr12 30.89, S64/spr8
    # 30.89, UNCOMPACTED 30.87 — the tuned config is within 0.03 dB of
    # every looser one; table in STATUS.md)
    cfg = PVDConfig(num_rays=NUM_RAYS, grid_size=128, max_steps=1024,
                    resolution0=300, max_samples=64, samples_per_ray=8.0,
                    autotune_budget=False)
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

    opt = build_optimizer(
        params_stu,
        label_fn=param_group_label(spec_stu),
        trainable_fn=trainable_label(spec_stu, ""),
        schedule_main=cosine_schedule(1e-2, 30000),
        schedule_lr2=cosine_schedule(1e-3, 30000),
    )
    state = TrainState(params=params_stu, opt_state=opt.init(params_stu),
                       occ=occ, step=jnp.int32(0))

    # camera orbit pose (synthetic convention)
    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.ops.rays import nerf_matrix_to_ngp

    pose = jnp.asarray(nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0),
                                          scale=0.8))

    step_fn = make_distill_step(
        spec_stu, spec_tea, rspec, opt, cfg,
        intrinsics=(1111.0, 1111.0, W / 2, H / 2), H=H, W=W, stage=3,
    )

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
                f"S_max={rspec.max_samples}, "
                f"budget={rspec.sample_budget(NUM_RAYS)})",
                "value": round(rays_per_sec, 1),
                "unit": "rays/sec/chip",
                "vs_baseline": round(rays_per_sec / 2.0e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
