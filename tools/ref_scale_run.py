"""Reference-scale quality run: 800x800 teacher + hash->vm distill on TPU.

VERDICT round-2 item 9: all prior quality evidence was 96x96/3000-iter
scale; this runs the production shapes end-to-end (teacher 8192 rays/step,
distill 4096 rays/step at the tuned S_max=64 / spr=6 budget, 800x800
images) on the procedural fixture.  Default lengths are HALF the reference
schedule (main_just_train_tea.py:25 = 40k, main_distill_mutual.py:53 =
30k); pass --full for the complete schedule.

Resume-friendly: the teacher phase resumes from its latest checkpoint
(--ckpt latest is the CLI default) and is skipped entirely once a best
checkpoint exists, so the script can simply be re-run after a TPU outage.

Run: python tools/ref_scale_run.py [--full] [--scan_steps 8]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PVD_DISABLE_TB", "1")  # no event-writer threads


def find_best(ws_prefix):
    cands = sorted(glob.glob(ws_prefix + "*/checkpoints/*best*.ckpt")) \
        + sorted(glob.glob(ws_prefix + "/checkpoints/*best*.ckpt"))
    return cands[0] if cands else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ref_scale_scene")
    ap.add_argument("--ws", default="/tmp/ref_scale_ws")
    ap.add_argument("--full", action="store_true",
                    help="full reference schedule (40k/30k) instead of half")
    ap.add_argument("--teacher_iters", type=int, default=0)
    ap.add_argument("--distill_iters", type=int, default=0)
    ap.add_argument("--scan_steps", type=int, default=8)
    ap.add_argument("--out", default="/tmp/ref_scale_result.json")
    ap.add_argument("--wall_budget", type=float, default=0.0,
                    help="total wall budget (s) split across both phases; "
                         "each phase ends gracefully at an epoch boundary "
                         "with its final checkpoint + eval (0 = unlimited)")
    args = ap.parse_args()
    t_run0 = time.time()

    tea_iters = args.teacher_iters or (40000 if args.full else 20000)
    dis_iters = args.distill_iters or (30000 if args.full else 15000)

    from pvd_tpu.utils.misc import setup_jax_cache_and_platform

    setup_jax_cache_and_platform()

    from pvd_tpu.data.synth import make_synthetic_scene

    if not os.path.exists(os.path.join(args.root, "transforms_train.json")):
        t0 = time.time()
        make_synthetic_scene(args.root, n_train=100, n_val=2, n_test=10,
                             H=800, W=800)
        print(f"[ref] scene at {args.root} ({time.time() - t0:.0f}s)")

    results = {"teacher_iters": tea_iters, "distill_iters": dis_iters}
    tea_ws = os.path.join(args.ws, "teacher")
    tea_ckpt = find_best(tea_ws)

    if tea_ckpt:
        print(f"[ref] reusing teacher {tea_ckpt}")
    else:
        from pvd_tpu.cli import train_teacher

        # teacher gets at most 50% of whatever budget remains (the final
        # eval runs inside the trainer, slightly past its own budget)
        tea_budget = 0.0
        if args.wall_budget:
            tea_budget = max(
                300.0, (args.wall_budget - (time.time() - t_run0)) * 0.5)
        t0 = time.time()
        stats = train_teacher.main([
            args.root, "--model_type", "hash", "--hash_cell_levels", "9",
            "--iters", str(tea_iters), "--grid_size", "128",
            "--num_rays", "8192", "--workspace", tea_ws,
            "--eval_interval", "100",
            "--scan_steps", str(args.scan_steps),
            "--wall_budget", str(tea_budget),
        ])
        results["teacher_psnr"] = stats.get("psnr")
        results["teacher_wall_s"] = round(time.time() - t0, 1)
        for k in ("train_rays_per_sec", "train_rays_per_sec_steady",
                  "train_compile_s", "train_eval_s", "train_occ_s",
                  "train_wall_s", "eval_s_per_image"):
            if k in stats:
                results[f"teacher_{k}"] = stats[k]
        print(f"[ref] teacher PSNR {stats.get('psnr')} "
              f"in {results['teacher_wall_s']}s")
        tea_ckpt = find_best(tea_ws)

    assert tea_ckpt, f"no teacher checkpoint under {tea_ws}*"

    from pvd_tpu.cli import distill

    dis_ws = os.path.join(args.ws, "h2v")
    dis_budget = 0.0
    if args.wall_budget:
        # leave ~180s headroom for the in-budget-overrun final eval + json
        dis_budget = max(
            300.0, args.wall_budget - (time.time() - t_run0) - 180.0)
    t0 = time.time()
    stats = distill.main([
        args.root, "--teacher_type", "hash", "--model_type", "vm",
        "--hash_cell_levels", "9", "--hash_bake_dense", "--grid_size", "128",
        "--ckpt_teacher", tea_ckpt, "--workspace", dis_ws,
        "--iters", str(dis_iters),
        "--stage_iters", "stage1=2000,stage2=5000",
        "--num_rays", "4096", "--max_samples", "64",
        "--samples_per_ray", "6", "--no_autotune_budget",
        "--scan_steps", str(args.scan_steps),
        "--eval_interval", "20", "--ckpt", "scratch",
        "--wall_budget", str(dis_budget),
    ])
    results["distill_psnr"] = stats.get("psnr")
    results["distill_wall_s"] = round(time.time() - t0, 1)
    for k in ("train_rays_per_sec", "train_rays_per_sec_steady",
              "train_compile_s", "train_eval_s", "train_occ_s",
              "train_wall_s", "eval_s_per_image", "eval_s_first_image"):
        if k in stats:
            results[f"distill_{k}"] = stats[k]
    results["schedule"] = "full" if (tea_iters >= 40000
                                     and dis_iters >= 30000) else "half"
    results["scale"] = ("800x800, procedural fixture "
                        "(100 train / 10 test views)")
    results["hardware"] = "1x TPU v5e via axon tunnel"
    results["reference_schedule"] = ("teacher main_just_train_tea.py:25 = "
                                     "40k iters; distill "
                                     "main_distill_mutual.py:53 = 30k")
    print(f"[ref] distill PSNR {stats.get('psnr')} "
          f"in {results['distill_wall_s']}s")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print("[ref] " + json.dumps(results))


if __name__ == "__main__":
    main()
