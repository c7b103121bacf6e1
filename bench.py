"""Benchmark: hash->vm distillation train-step throughput (rays/sec/chip).

Headline metric from BASELINE.md: >= 2 Mrays/sec/chip on TPU for hash->vm
distillation (train + render: every step renders the student AND the teacher
on the student's samples, then backprops the student).

Measured at the TUNED production config (4096 rays/step -- the reference
distill default, main_distill_mutual.py:56-61 -- S_max=64, global sample
budget 6/ray; round-3 quality A/B on the synthetic fixture: teacher
31.26 dB, distilled students 31.12 (spr=8) vs 31.09 (spr=6) -- the
tighter budget costs 0.02 dB, see STATUS.md) on a clustered occupancy
grid shaped like a converged Synthetic-NeRF scene (a shell-and-blobs
object at ~4% occupancy), not a uniform-random bitfield.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Robustness contract (round-3): this script must ALWAYS print its JSON line
well inside the driver budget, even if the tuned config compiles slowly
through the axon tunnel.  Strategy:
  1. persistent compilation cache (/tmp/jax_bench_cache) so repeat runs
     skip all compiles;
  2. a cheap fallback config (S_max=32, the round-1 shape that is proven
     to compile fast) is measured FIRST and stored as the result;
  3. the tuned config then overwrites it if it completes;
  4. a watchdog thread prints the best result so far and hard-exits when
     PVD_BENCH_BUDGET_S (default 420s) is reached, so a hung/slow compile
     can never turn into rc=124 with no output.

Process layout: the parent NEVER touches the axon backend.  ONE child
process both probes and measures on the TPU (cold init is ~144s, measured
2026-08-19 — a separate probe child would pay it twice), streaming its
best-result-so-far as "BEST {json}" lines; the parent adopts the latest
line and emits it at child exit or watchdog.  If the child shows no
backend within PVD_BENCH_PROBE_S (wedged tunnel blocks ~25 min), the
parent measures on CPU in-process — the child is never killed (killing a
TPU client wedges the tunnel); an orphaned child that finishes late still
warms the persistent cache for the next run.
"""

import json
import os
import sys
import threading
import time

import numpy as np

T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("PVD_BENCH_BUDGET_S", "420"))

_result = {
    "metric": "hash->vm distill train-step throughput (no config completed)",
    "value": 0.0,
    "unit": "rays/sec/chip",
    "vs_baseline": 0.0,
    "degraded": True,
}
_printed = threading.Event()


def log(msg):
    print(f"[bench +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def emit_and_exit():
    if not _printed.is_set():
        _printed.set()
        print(json.dumps(_result), flush=True)
    # hard exit: a compile may be stuck inside the tunnel; sys.exit would
    # block on it.  os._exit still closes the process cleanly enough for
    # the driver to read stdout.
    os._exit(0)


def watchdog():
    log(f"WATCHDOG fired at {BUDGET_S}s -- emitting best result so far")
    emit_and_exit()


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


def cascaded_bitfield(H: int, C: int) -> np.ndarray:
    """Cascade 0 = the object grid; outer cascades = a sparse far shell
    (like a converged tank/LLFF grid, where cascade>0 holds background
    geometry at ~2% occupancy)."""
    parts = [object_like_bitfield(H)]
    ax = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    for _ in range(1, C):
        parts.append(((r > 0.80) & (r < 0.86)).reshape(-1))
    return np.concatenate(parts)


def bench_config(label, cfg, iters, scan_steps=0, bake=False):
    """Build + run one distill-step config; return (metric_str, rays/sec)."""
    import jax
    import jax.numpy as jnp

    from pvd_tpu.config import ModelSpec
    from pvd_tpu.engine.optim import build_optimizer, cosine_schedule
    from pvd_tpu.engine.train_steps import TrainState, make_distill_step
    from pvd_tpu.models import init_field
    from pvd_tpu.models.api import param_group_label, trainable_label
    from pvd_tpu.models.hash_field import attach_packed
    from pvd_tpu.render import init_occupancy_state
    from pvd_tpu.render.occupancy import set_bitfield

    NUM_RAYS = cfg.num_rays
    H, W = 800, 800
    rspec = cfg.render_spec()
    spec_tea = ModelSpec(model_type="hash", compute_dtype="bfloat16",
                         hash_cell_levels=9, hash_bake_dense=bake,
                         bound=cfg.bound)
    spec_stu = ModelSpec(model_type="vm", vm_resolution=(300, 300, 300),
                         compute_dtype="bfloat16", bound=cfg.bound)

    k = jax.random.PRNGKey(0)
    params_tea = attach_packed(init_field(jax.random.fold_in(k, 0), spec_tea),
                               spec_tea)
    params_stu = init_field(jax.random.fold_in(k, 1), spec_stu)

    occ = set_bitfield(
        init_occupancy_state(rspec),
        jnp.asarray(cascaded_bitfield(rspec.grid_size, rspec.cascades)))

    opt = build_optimizer(
        params_stu,
        label_fn=param_group_label(spec_stu),
        trainable_fn=trainable_label(spec_stu, ""),
        schedule_main=cosine_schedule(1e-2, 30000),
        schedule_lr2=cosine_schedule(1e-3, 30000),
    )
    state = TrainState(params=params_stu, opt_state=opt.init(params_stu),
                       occ=occ, step=jnp.int32(0))

    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.ops.rays import nerf_matrix_to_ngp

    pose = jnp.asarray(nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0),
                                          scale=0.8))

    step_fn = make_distill_step(
        spec_stu, spec_tea, rspec, opt, cfg,
        intrinsics=(1111.0, 1111.0, W / 2, H / 2), H=H, W=W, stage=3,
        scan_steps=scan_steps,
    )
    if scan_steps:
        pose = jnp.tile(pose[None], (scan_steps, 1, 1))

    log(f"{label}: built, dispatching warmup (compile happens here)")
    # ONE constant key: the step folds state.step in internally, so no
    # per-iteration host-side split (an extra tiny device dispatch that
    # serializes against the step on the tunnel stream)
    key = jax.random.PRNGKey(1)
    state, logs = step_fn(state, params_tea, occ, pose, key)
    float(jnp.sum(logs["loss"]))  # force full sync through the tunnel
    log(f"{label}: compile+first step done")
    # one more warm step so the timed loop starts from steady state
    state, logs = step_fn(state, params_tea, occ, pose, key)
    float(jnp.sum(logs["loss"]))

    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step_fn(state, params_tea, occ, pose, key)
    float(jnp.sum(logs["loss"]))
    dt = time.perf_counter() - t0
    rays_per_sec = NUM_RAYS * max(scan_steps, 1) * iters / dt
    log(f"{label}: {rays_per_sec:,.0f} rays/s ({iters} iters in {dt:.2f}s)")

    metric = (
        "hash->vm distill train-step throughput "
        f"({jax.default_backend()}, {NUM_RAYS} rays/step, "
        f"S_max={rspec.max_samples}, "
        f"budget={rspec.sample_budget(NUM_RAYS)}"
        + (f", scan_steps={scan_steps}" if scan_steps else "") + ")"
    )
    return metric, rays_per_sec


def run_phases(res: dict, use_tpu: bool, on_update=None):
    """Measure phases 1-5 into `res` (best-result-so-far dict), invoking
    on_update() after every improvement so a supervising parent always
    holds the latest adoptable result."""
    from pvd_tpu.config import PVDConfig

    def adopt(metric, rps, degraded=False):
        res.update(metric=metric, value=round(rps, 1),
                   vs_baseline=round(rps / 2.0e6, 4))
        if degraded:
            res["degraded"] = True
        else:
            res.pop("degraded", None)
        if on_update:
            on_update()

    # On the CPU fallback the per-step wall is ~100x the TPU's: shrink the
    # timed loops so a measured (clearly CPU-labeled) number still lands
    # inside the budget.  The result metric carries jax.default_backend().
    it1, it2, it4 = (10, 30, 6) if use_tpu else (2, 3, 1)

    # Phase 1: cheap fallback (round-1 proven-fast shape). Secures a real
    # measured number before we attempt anything expensive.
    try:
        cfg_cheap = PVDConfig(num_rays=4096, grid_size=128, max_steps=1024,
                              resolution0=300, max_samples=32,
                              samples_per_ray=8.0, autotune_budget=False)
        metric, rps = bench_config("fallback(S_max=32)", cfg_cheap, iters=it1)
        adopt(metric, rps, degraded=True)
    except Exception as e:  # keep going: tuned config may still work
        log(f"fallback config FAILED: {type(e).__name__}: {e}")

    # Phase 2: tuned production config (the real headline number).
    try:
        cfg = PVDConfig(num_rays=4096, grid_size=128, max_steps=1024,
                        resolution0=300, max_samples=64, samples_per_ray=6.0,
                        autotune_budget=False)
        metric, rps = bench_config("tuned(S_max=64)", cfg, iters=it2)
        adopt(metric, rps)
    except Exception as e:
        log(f"tuned config FAILED: {type(e).__name__}: {e}")
        cfg = None

    # Phase 3: baked frozen-teacher dense levels (--hash_bake_dense): the 5
    # dense teacher levels cost ONE gathered row instead of five (the v5e
    # gather engine is row-rate-bound at 16-512B rows).  Teacher-side
    # approximation, quality-A/B'd (STATUS.md); kept only if faster.
    bake = False
    if cfg is not None:
        try:
            metric, rps = bench_config("tuned+bake", cfg, iters=it2,
                                       bake=True)
            if rps > res.get("value", 0.0):
                bake = True
                adopt(metric + " +bake", rps)
        except Exception as e:
            log(f"bake config FAILED: {type(e).__name__}: {e}")

        # Phase 4: scan-fused tuned config (Trainer --scan_steps path).  The
        # K-step lax.scan amortizes the per-dispatch host+tunnel overhead;
        # its one-time compile is long through the axon tunnel, so this
        # phase only improves the result when the persistent cache is warm
        # — the supervisor keeps the best number so far otherwise.
        try:
            metric, rps = bench_config("tuned+scan(K=8)", cfg, iters=it4,
                                       scan_steps=8, bake=bake)
            if rps > res.get("value", 0.0):
                adopt(metric + (" +bake" if bake else ""), rps)
        except Exception as e:
            log(f"scan config FAILED: {type(e).__name__}: {e}")

    # Phase 5 (auxiliary, never replaces the headline): the cascaded /
    # dt_gamma>0 march (LLFF/tank dataset class, raymarching.cu:44-56 mip
    # logic).  Recorded as cascade_rays_per_sec + its ratio to the
    # synthetic-config headline so the multi-cascade probe march's perf
    # class is on-record (round-2 VERDICT item 4: within 2x of synthetic).
    try:
        cfg_c = PVDConfig(num_rays=4096, grid_size=128, max_steps=1024,
                          resolution0=300, max_samples=64,
                          samples_per_ray=6.0, autotune_budget=False,
                          bound=2.0, dt_gamma=1.0 / 256.0)
        _, rps_c = bench_config("cascade(bound=2,dt_gamma=1/256)", cfg_c,
                                iters=it2, bake=bake)
        res["cascade_rays_per_sec"] = round(rps_c, 1)
        if res.get("value", 0.0) > 0:
            res["cascade_vs_headline"] = round(rps_c / res["value"], 3)
        if on_update:
            on_update()
    except Exception as e:
        log(f"cascade config FAILED: {type(e).__name__}: {e}")


def _setup_cache(jax, use_tpu: bool):
    """Persistent compile cache: repeat runs (and the driver run after this
    session has warmed the cache) skip every compile.  CPU uses a host-keyed
    dir (XLA:CPU AOT executables SIGILL on a different host); TPU
    executables are for the device, shared across hosts."""
    if use_tpu:
        cache_dir = "/tmp/jax_bench_cache"
    else:
        from pvd_tpu.utils.misc import cpu_cache_key

        cache_dir = f"/tmp/jax_test_cache_{cpu_cache_key()}"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _run_cpu_phases() -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    _setup_cache(jax, use_tpu=False)
    log(f"parent measuring on backend={jax.default_backend()}")
    res = {}
    try:
        run_phases(res, use_tpu=False)
    except Exception as e:
        log(f"CPU measurement FAILED: {type(e).__name__}: {e}")
    res["degraded"] = True  # a CPU number is a liveness signal, not the
    return res              # headline metric


def child_main():
    """TPU child: its own backend init IS the probe (cold init ~144s,
    measured 2026-08-19 — a separate probe process would pay it twice).
    Streams INIT_OK / "BEST {json}" / DONE lines for the parent to adopt;
    all human-readable logging goes to stderr."""
    import jax

    _setup_cache(jax, use_tpu=True)
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    float((x @ x).sum())
    if jax.default_backend() != "tpu":
        print("INIT_CPU", flush=True)  # axon absent; parent measures on CPU
        return
    print("INIT_OK", flush=True)
    log("child: tpu backend up")
    res = {}
    run_phases(res, use_tpu=True,
               on_update=lambda: print("BEST " + json.dumps(res), flush=True))
    print("DONE", flush=True)


def _adopt(best: dict):
    """Replace _result's payload with `best` (drop stale optional keys)."""
    for k in ("degraded", "cascade_rays_per_sec", "cascade_vs_headline"):
        _result.pop(k, None)
    _result.update(best)


def main():
    timer = threading.Timer(BUDGET_S, watchdog)
    timer.daemon = True
    timer.start()

    if os.environ.get("PVD_FORCE_CPU"):
        # tool-wide CPU switch; never spawns a TPU client
        _adopt(_run_cpu_phases())
        timer.cancel()
        emit_and_exit()

    import subprocess

    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--tpu-child"],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
    state = {"init": None, "best": None}

    def reader():
        for line in child.stdout:
            line = line.strip()
            if line == "INIT_OK":
                state["init"] = True
                log("child: TPU init confirmed")
            elif line == "INIT_CPU":
                state["init"] = False
            elif line.startswith("BEST "):
                state["best"] = json.loads(line[5:])
                _adopt(state["best"])  # watchdog always emits the latest
                log(f"child best so far: {state['best'].get('value')}")

    reader_t = threading.Thread(target=reader, daemon=True)
    reader_t.start()

    # If the child shows no backend within the probe window (a wedged
    # tunnel blocks ~25 min), measure on CPU in-process.  The child is
    # NEVER killed (killing a TPU client wedges the tunnel); if it finishes
    # late it still warms the persistent cache for the next run.
    probe_s = float(os.environ.get("PVD_BENCH_PROBE_S", "0")) \
        or min(240.0, BUDGET_S * 0.55)
    cpu_res = None
    t0 = time.perf_counter()
    while child.poll() is None:
        if (state["init"] is None and cpu_res is None
                and time.perf_counter() - t0 >= probe_s):
            log(f"child silent after {probe_s:.0f}s -- parent measures on "
                "CPU (child left to finish on its own)")
            cpu_res = _run_cpu_phases()
            if state["best"] is None:
                _adopt(cpu_res)
        if state["init"] is False:
            break  # no TPU behind the tunnel; child exits on its own
        time.sleep(1.0)

    if child.poll() is not None:
        reader_t.join(timeout=10.0)  # drain the child's final BEST line

    if state["best"] is None and cpu_res is None:
        # child exited with no TPU (or crashed before any phase)
        cpu_res = _run_cpu_phases()
        _adopt(cpu_res)
    timer.cancel()
    emit_and_exit()


if __name__ == "__main__":
    if "--tpu-child" in sys.argv:
        child_main()
    else:
        main()
