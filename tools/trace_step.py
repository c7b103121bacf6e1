"""Device-op profile of the hash->vm distill step via jax.profiler.

Runs the tuned-config distill step under jax.profiler.trace and aggregates
the DEVICE-side XLA op durations from the trace (works through the axon
tunnel — verified: traces carry /device:TPU:0 'XLA Ops' events).  Prints the
top fusions by total time, which is ground truth the host-side step timers
can't give (async dispatch + scheduling variance).

Run: python tools/trace_step.py [--rays 4096] [--smax 64] [--spr 8] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--smax", type=int, default=64)
    ap.add_argument("--spr", type=float, default=6.0)
    ap.add_argument("--cell_levels", type=int, default=9)
    ap.add_argument("--res0", type=int, default=300)
    ap.add_argument("--bound", type=float, default=1.0)
    ap.add_argument("--dt_gamma", type=float, default=0.0)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--bake", action="store_true",
                    help="baked frozen-teacher dense levels (hash_bake_dense)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="/tmp/pvd_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PVD_CACHE_DIR", "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pvd_tpu.config import ModelSpec, PVDConfig
    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.engine.optim import build_optimizer, cosine_schedule
    from pvd_tpu.engine.train_steps import TrainState, make_distill_step
    from pvd_tpu.models import init_field
    from pvd_tpu.models.api import param_group_label, trainable_label
    from pvd_tpu.models.hash_field import attach_packed
    from pvd_tpu.ops.rays import nerf_matrix_to_ngp
    from pvd_tpu.render import init_occupancy_state
    from pvd_tpu.render.occupancy import set_bitfield

    N = args.rays
    cfg = PVDConfig(num_rays=N, max_samples=args.smax, grid_size=128,
                    max_steps=1024, resolution0=args.res0,
                    samples_per_ray=args.spr, autotune_budget=False,
                    bound=args.bound, dt_gamma=args.dt_gamma)
    rspec = cfg.render_spec()
    spec_tea = ModelSpec(model_type="hash", compute_dtype="bfloat16",
                         hash_cell_levels=args.cell_levels,
                         hash_bake_dense=args.bake)
    spec_stu = ModelSpec(model_type="vm", vm_resolution=(args.res0,) * 3,
                         compute_dtype="bfloat16")

    k = jax.random.PRNGKey(0)
    params_tea = attach_packed(init_field(jax.random.fold_in(k, 0), spec_tea),
                               spec_tea)
    params_stu = init_field(jax.random.fold_in(k, 1), spec_stu)
    occ = init_occupancy_state(rspec)
    g = np.zeros((128,) * 3, bool)
    ax3 = (np.arange(128) + 0.5) / 128 * 2 - 1
    X, Y, Z = np.meshgrid(ax3, ax3, ax3, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    g |= (r > 0.42) & (r < 0.5)
    # cascades > 1: far shell in the outer cascade(s), like bench.py's
    # cascaded_bitfield (passing a C=1-length bitfield here used to
    # silently disable the MC probe path and trace the WRONG march)
    parts = [g.reshape(-1)]
    for _ in range(1, rspec.cascades):
        parts.append(((r > 0.80) & (r < 0.86)).reshape(-1))
    occ = set_bitfield(occ, jnp.asarray(np.concatenate(parts)))

    opt = build_optimizer(
        params_stu, label_fn=param_group_label(spec_stu),
        trainable_fn=trainable_label(spec_stu, ""),
        schedule_main=cosine_schedule(1e-2, 30000),
        schedule_lr2=cosine_schedule(1e-3, 30000))
    state = TrainState(params=params_stu, opt_state=opt.init(params_stu),
                       occ=occ, step=jnp.int32(0))
    pose = jnp.asarray(nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0),
                                          scale=0.8))
    step_fn = make_distill_step(spec_stu, spec_tea, rspec, opt, cfg,
                                intrinsics=(1111.0, 1111.0, 400.0, 400.0),
                                H=800, W=800, stage=3)

    keys = jax.random.split(jax.random.PRNGKey(3), args.iters + 3)
    for i in range(3):
        state, logs = step_fn(state, params_tea, occ, pose, keys[i])
    float(logs["loss"])

    os.system(f"rm -rf {args.out}")
    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            state, logs = step_fn(state, params_tea, occ, pose, keys[3 + i])
        float(logs["loss"])

    # parse newest trace
    paths = sorted(glob.glob(f"{args.out}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    pid_dev = None
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in str(e.get("args", {}).get("name", "")):
            pid_dev = e["pid"]
    agg = defaultdict(float)
    cnt = defaultdict(int)
    src_of = {}
    total = 0.0
    module_total = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != pid_dev:
            continue
        name = e["name"]
        dur = e.get("dur", 0.0)
        if name.startswith("jit_"):
            module_total += dur
            continue
        if name.isdigit():  # "Steps"-thread step markers, not ops
            continue
        agg[name] += dur
        cnt[name] += 1
        a = e.get("args") or {}
        if "source" in a:
            src_of[name] = a["source"].replace("/root/repo/", "")
        total += dur
    print(f"device module total: {module_total / args.iters / 1e3:.3f} "
          f"ms/step ({args.iters} steps) -> "
          f"{N / (module_total / args.iters / 1e6):,.0f} rays/s device-time")
    print(f"sum of ops: {total / args.iters / 1e3:.3f} ms/step\n")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
    for name, dur in rows:
        print(f"{dur / args.iters / 1e3:8.3f} ms  x{cnt[name] // args.iters:<4d}"
              f" {name[:40]:40s} {src_of.get(name, '')}")

    # aggregate by source file:line (per-op 'source' attribute) — the
    # definitive per-subsystem breakdown
    by_src = defaultdict(float)
    by_cat = defaultdict(float)
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != pid_dev:
            continue
        a = e.get("args") or {}
        if "source" not in a and "hlo_category" not in a:
            continue
        if e["name"].startswith("jit_") or e["name"].isdigit():
            continue
        dur = e.get("dur", 0.0)
        src = a.get("source", "?")
        src = src.replace("/root/repo/", "")
        by_src[src] += dur
        by_cat[a.get("hlo_category", "?")] += dur
    print("\n--- by hlo_category (ms/step) ---")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{v / args.iters / 1e3:8.3f} ms  {k}")
    print("\n--- by source line (ms/step, top) ---")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v / args.iters / 1e3:8.3f} ms  {k}")


if __name__ == "__main__":
    main()
