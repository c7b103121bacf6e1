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

Process layout (round-4 revision; BENCH_r03 fell back to CPU because the
in-process CPU fallback starved the TPU child's cold init on the same
host): the parent NEVER touches any backend and NEVER measures anything
itself.  TWO children stream best-result-so-far "BEST {json}" lines:
  - the TPU child (spawned immediately; its backend init IS the probe,
    cold init ~144s on a warm host, slower on a cold one);
  - a `nice -n 19` CPU child (spawned after PVD_BENCH_CPU_DELAY_S,
    default 30s) that measures the clearly-labeled CPU liveness number
    with tiny iteration counts, yielding the host CPU to the TPU child
    whenever it is runnable.
Adoption is lock-protected and TPU-first: once a TPU BEST line has been
adopted the CPU child is terminated (it holds no TPU — safe to kill) and
later CPU lines are ignored.  The TPU child is NEVER killed (killing a
TPU client wedges the tunnel ~15 min); if it finishes after the watchdog
it still warms the persistent cache for the next run.
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
_result_lock = threading.Lock()  # _adopt races reader threads vs watchdog
_result_src = None  # "tpu" | "cpu"; a tpu result is never clobbered by cpu
_printed = threading.Event()
_extra_innings = threading.Event()  # TPU child alive at deadline: keep going
_quiet = threading.Event()  # post-deadline: suppress stderr chatter


def log(msg):
    if _quiet.is_set():
        return
    print(f"[bench +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def emit_line():
    """Print the current best result as a JSON line (repeatable: the
    driver parses a JSON line out of the output tail — BENCH_r03's line
    was parsed with a traceback after it — and a later, better line
    supersedes an earlier one)."""
    with _result_lock:  # never serialize a half-updated _adopt
        line = json.dumps(_result)
    print(line, flush=True)


def emit_and_exit():
    if not _printed.is_set():
        _printed.set()
        emit_line()
    # hard exit: a compile may be stuck inside the tunnel; sys.exit would
    # block on it.  os._exit still closes the process cleanly enough for
    # the driver to read stdout.
    os._exit(0)


def watchdog():
    """BUDGET_S contract deadline: a JSON line MUST be on stdout now.

    Extra innings (round-4): the TPU child's axon backend init is
    service-side variance — measured 85 s / 219 s / 604 s on consecutive
    same-host attempts 2026-08-19 — so it can overrun any fixed budget.
    If no TPU result landed yet but the TPU child is still working,
    print the (degraded) line to honor the contract and KEEP WAITING up
    to PVD_BENCH_HARD_S; every TPU adoption prints a fresh, better line.
    If the driver's own timeout kills us mid-wait, the 420 s line is
    already in the tail; if the TPU lands first, the last line wins."""
    log(f"WATCHDOG fired at {BUDGET_S}s -- emitting best result so far")
    if _extra_innings.is_set():
        _printed.set()
        emit_line()
        _quiet.set()  # keep the output tail clean for the driver's parser
        return
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


def bench_teacher(label, iters, scan_steps=8):
    """Teacher-class step throughput (hash GT training, 8192 rays/step,
    S_max=96, budget 24/ray — the reference schedule's teacher shape as
    settled by autotune in the 800x800 ref-scale run).  Gives the
    end-to-end teacher rays/s (REF_SCALE_r05) a same-class bench
    denominator: the teacher marches real occupancy at ~4x the distill
    headline's per-ray sample budget, so its class is inherently
    heavier (reference: main_just_train_tea.py 8192 rays, full march).
    Returns rays/sec."""
    import jax
    import jax.numpy as jnp

    from pvd_tpu.config import ModelSpec, PVDConfig
    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.engine.optim import build_optimizer, cosine_schedule
    from pvd_tpu.engine.train_steps import TrainState, make_teacher_step
    from pvd_tpu.models import init_field
    from pvd_tpu.models.api import param_group_label, trainable_label
    from pvd_tpu.ops.rays import nerf_matrix_to_ngp
    from pvd_tpu.render import init_occupancy_state
    from pvd_tpu.render.occupancy import set_bitfield

    H = W = 800
    cfg = PVDConfig(num_rays=8192, grid_size=128, max_steps=1024,
                    resolution0=300, max_samples=96, samples_per_ray=24.0,
                    autotune_budget=False)
    rspec = cfg.render_spec()
    spec = ModelSpec(model_type="hash", compute_dtype="bfloat16",
                     hash_cell_levels=9)
    params = init_field(jax.random.PRNGKey(0), spec)
    occ = set_bitfield(
        init_occupancy_state(rspec),
        jnp.asarray(cascaded_bitfield(rspec.grid_size, rspec.cascades)))
    opt = build_optimizer(
        params, label_fn=param_group_label(spec),
        trainable_fn=trainable_label(spec, ""),
        schedule_main=cosine_schedule(1e-2, 40000),
        schedule_lr2=cosine_schedule(1e-3, 40000))
    state = TrainState(params=params, opt_state=opt.init(params),
                       occ=occ, step=jnp.int32(0))
    step_fn = make_teacher_step(
        spec, rspec, opt, cfg, intrinsics=(1111.0, 1111.0, W / 2, H / 2),
        H=H, W=W, image_channels=3, scan_steps=scan_steps)
    pose = jnp.asarray(nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0),
                                          scale=0.8))
    poses = jnp.tile(pose[None], (scan_steps, 1, 1))
    images = jnp.tile(
        jnp.linspace(0.0, 1.0, H * W, dtype=jnp.float32)[None, :, None],
        (1, 1, 3))
    idxs = jnp.zeros((scan_steps,), jnp.int32)
    key = jax.random.PRNGKey(1)

    log(f"{label}: built, dispatching warmup (compile happens here)")
    state, logs = step_fn(state, images, idxs, poses, key)
    float(jnp.sum(logs["loss"]))
    state, logs = step_fn(state, images, idxs, poses, key)
    float(jnp.sum(logs["loss"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step_fn(state, images, idxs, poses, key)
    float(jnp.sum(logs["loss"]))
    dt = time.perf_counter() - t0
    rps = cfg.num_rays * scan_steps * iters / dt
    log(f"{label}: {rps:,.0f} rays/s ({iters} iters in {dt:.2f}s)")
    return rps


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
        # scan-fused cascade (same production --scan_steps path as the
        # headline's phase 4): amortizes the ~1.2 ms/step host+tunnel
        # dispatch; kept only if faster
        _, rps_cs = bench_config("cascade+scan(K=8)", cfg_c, iters=it4,
                                 scan_steps=8, bake=bake)
        if rps_cs > rps_c:
            res["cascade_rays_per_sec"] = round(rps_cs, 1)
            if res.get("value", 0.0) > 0:
                res["cascade_vs_headline"] = round(
                    rps_cs / res["value"], 3)
            if on_update:
                on_update()
    except Exception as e:
        log(f"cascade config FAILED: {type(e).__name__}: {e}")

    # Phase 6 (auxiliary): rays/step scaling curve (VERDICT r4 item 1).
    # The 2 Mrays/s target was never probed above the reference-parity
    # 4096 rays/step; fixed per-step costs (top_k, occupancy gathers,
    # dispatch) amortize with batch.  4096 stays the headline; the curve
    # is recorded so the batch-size lever is on-record.
    if cfg is not None:
        curve = {"4096": res.get("value", 0.0)}
        for nr in (8192, 16384):
            try:
                cfg_n = PVDConfig(num_rays=nr, grid_size=128,
                                  max_steps=1024, resolution0=300,
                                  max_samples=64, samples_per_ray=6.0,
                                  autotune_budget=False)
                _, rps_n = bench_config(f"scale(rays={nr},scan=8)", cfg_n,
                                        iters=max(it4 // 2, 1),
                                        scan_steps=8, bake=bake)
                curve[str(nr)] = round(rps_n, 1)
            except Exception as e:
                log(f"scale rays={nr} FAILED: {type(e).__name__}: {e}")
        res["scaling_curve_rays_per_sec"] = curve
        # Measured platform ceiling (VERDICT r4 item 1, STATUS.md round 5):
        # every major step block sits at a measured engine rate (gather
        # ~210-547M rows/s by table shape, scatter ~20ns/update-row,
        # optax at the HBM roofline) and the rays/step curve is FLAT
        # (per-step cost is M-proportional gather/scatter rows), so the
        # reference-parity workload (spr=6, VM 300^3 R=64 student,
        # 14-level hash teacher) ceilings at ~0.8-0.9M rays/s/chip with
        # every remaining cut landed; 2M needs different workload
        # semantics (fewer samples/ray, smaller student, baked teacher),
        # each quality-gated.
        res["ceiling_est_rays_per_sec"] = 850000
        res["ceiling_basis"] = (
            "flat batch curve + all blocks at measured engine rates "
            "(see STATUS.md round-5 ceiling decomposition)")
        if on_update:
            on_update()

    # Phase 7 (auxiliary): teacher-class throughput — the e2e denominator
    # for REF_SCALE's teacher phase (VERDICT r4 item 2).
    try:
        rps_t = bench_teacher("teacher(8192 rays,S=96,spr=24,scan=8)",
                              iters=max(it4 // 2, 1))
        res["teacher_rays_per_sec"] = round(rps_t, 1)
        if on_update:
            on_update()
    except Exception as e:
        log(f"teacher config FAILED: {type(e).__name__}: {e}")


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


def _say(line: str):
    """Child -> parent control line; pipe-safe.  If the parent is gone
    (watchdog emitted and exited — BENCH_r03's BrokenPipeError) the child
    keeps running to warm the persistent cache for the next run."""
    try:
        print(line, flush=True)
    except (BrokenPipeError, OSError):
        pass


def child_main(use_tpu: bool):
    """Measurement child.  TPU flavor: its own backend init IS the probe
    (cold init ~144s warm-host, measured 2026-08-19; slower cold).  CPU
    flavor: jax_platforms pinned to cpu, tiny iteration counts, runs at
    nice 19 so it never starves the TPU child's init/compile.  Both stream
    INIT_OK / "BEST {json}" / DONE control lines on stdout; human-readable
    logging goes to stderr."""
    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
    _setup_cache(jax, use_tpu=use_tpu)
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    float((x @ x).sum())
    if use_tpu and jax.default_backend() != "tpu":
        _say("INIT_CPU")  # axon absent; the CPU child carries the result
        return
    _say("INIT_OK")
    log(f"child[{'tpu' if use_tpu else 'cpu'}]: backend up "
        f"({jax.default_backend()})")
    res = {} if use_tpu else {"degraded": True}  # a CPU number is a
    # liveness signal, never the headline metric

    def on_update():
        if not use_tpu:
            res["degraded"] = True
        _say("BEST " + json.dumps(res))

    run_phases(res, use_tpu=use_tpu, on_update=on_update)
    _say("DONE")


def _adopt(best: dict, src: str) -> bool:
    """Replace _result's payload with `best` (drop stale optional keys).
    Lock-protected; a CPU result never clobbers an adopted TPU result."""
    global _result_src
    with _result_lock:
        if src == "cpu" and _result_src == "tpu":
            return False
        for k in ("degraded", "cascade_rays_per_sec", "cascade_vs_headline",
                  "scaling_curve_rays_per_sec", "ceiling_est_rays_per_sec",
                  "ceiling_basis", "teacher_rays_per_sec"):
            _result.pop(k, None)
        _result.update(best)
        _result_src = src
        return True


def _spawn_child(kind: str):
    """kind: 'tpu' | 'cpu'.  The CPU child runs at nice 19 (lowest
    priority) so the TPU child's cold init / compiles always win the host
    CPU — the BENCH_r03 failure mode was the reverse."""
    import subprocess

    argv = [sys.executable, os.path.abspath(__file__), f"--{kind}-child"]
    if kind == "cpu":
        argv = ["nice", "-n", "19"] + argv
    return subprocess.Popen(argv, stdout=subprocess.PIPE, stderr=sys.stderr,
                            text=True)


def _reader(child, kind: str, state: dict, cpu_child_box: dict):
    """Drain one child's stdout, adopting its BEST lines.  Per-line
    try/except: one malformed line must not stop the drain (a full pipe
    blocks the child mid-run)."""
    for line in child.stdout:
        try:
            line = line.strip()
            if line == "INIT_OK":
                state[f"{kind}_init"] = True
                log(f"{kind} child: init confirmed")
            elif line == "INIT_CPU":
                state[f"{kind}_init"] = False
                log(f"{kind} child: no TPU behind the tunnel")
            elif line.startswith("BEST "):
                best = json.loads(line[5:])
                if _adopt(best, kind):
                    state[f"{kind}_best"] = best
                    log(f"{kind} child best so far: {best.get('value')}")
                    if kind == "tpu" and _printed.is_set():
                        # extra innings: the contract line is already out;
                        # a TPU improvement supersedes it (last line wins)
                        emit_line()
                if kind == "tpu":
                    # a real TPU number is in hand: the CPU liveness child
                    # is now pure contention — kill it (it holds no TPU)
                    cc = cpu_child_box.get("proc")
                    if cc is not None and cc.poll() is None:
                        log("terminating CPU child (TPU result adopted)")
                        cc.terminate()
        except Exception as e:
            log(f"{kind} reader: bad line ignored "
                f"({type(e).__name__}: {e})")


def _env_seconds(name: str, default: float) -> float:
    """Parse a seconds override; 0 is a valid value (immediate), malformed
    values fall back to the default instead of crashing before the
    watchdog can protect the JSON contract."""
    env = os.environ.get(name)
    if env is None:
        return default
    try:
        return float(env)
    except ValueError:
        log(f"bad {name}={env!r}; using default {default}")
        return default


def main():
    timer = threading.Timer(BUDGET_S, watchdog)
    timer.daemon = True
    timer.start()

    if os.environ.get("PVD_FORCE_CPU"):
        # tool-wide CPU switch; never spawns a TPU client.  Streams every
        # phase improvement into _result so a watchdog fire mid-run still
        # emits the best measured number (round-3 advisor item).
        import jax

        jax.config.update("jax_platforms", "cpu")
        _setup_cache(jax, use_tpu=False)
        res = {"degraded": True}

        def on_update():
            res["degraded"] = True
            _adopt(dict(res), "cpu")

        try:
            run_phases(res, use_tpu=False, on_update=on_update)
        except Exception as e:
            log(f"CPU measurement FAILED: {type(e).__name__}: {e}")
        timer.cancel()
        emit_and_exit()

    cpu_delay = _env_seconds("PVD_BENCH_CPU_DELAY_S", 30.0)
    state = {}
    cpu_box = {}
    tpu_child = _spawn_child("tpu")
    threading.Thread(target=_reader, args=(tpu_child, "tpu", state, cpu_box),
                     daemon=True).start()

    hard_s = _env_seconds("PVD_BENCH_HARD_S", 1500.0)
    cpu_reader_t = None
    t0 = time.perf_counter()
    while True:
        now = time.perf_counter() - t0
        tpu_done = tpu_child.poll() is not None
        # extra innings eligibility: the TPU child is alive and might
        # still deliver — the watchdog then prints the contract line but
        # does NOT exit (see watchdog docstring)
        if not tpu_done and state.get("tpu_init") is not False:
            _extra_innings.set()
        else:
            _extra_innings.clear()
        # start the niced CPU liveness child once the delay elapses (or
        # immediately if the TPU child reported no backend / died early),
        # unless a TPU result already landed
        if (cpu_box.get("proc") is None and state.get("tpu_best") is None
                and (now >= cpu_delay or state.get("tpu_init") is False
                     or tpu_done)):
            log("starting niced CPU liveness child")
            cpu_box["proc"] = _spawn_child("cpu")
            cpu_reader_t = threading.Thread(
                target=_reader, args=(cpu_box["proc"], "cpu", state, cpu_box),
                daemon=True)
            cpu_reader_t.start()
        cpu_child = cpu_box.get("proc")
        cpu_done = cpu_child is not None and cpu_child.poll() is not None
        if tpu_done and state.get("tpu_best") is not None:
            break  # TPU result in hand and its child finished
        if tpu_done and cpu_done:
            break  # no TPU result will come; CPU child has finished too
        if now >= hard_s:
            log(f"hard cap {hard_s}s reached")
            break
        time.sleep(1.0)

    time.sleep(2.0)  # let the reader threads drain any final BEST line
    timer.cancel()
    emit_and_exit()


if __name__ == "__main__":
    if "--tpu-child" in sys.argv:
        child_main(use_tpu=True)
    elif "--cpu-child" in sys.argv:
        child_main(use_tpu=False)
    else:
        main()
