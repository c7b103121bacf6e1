"""Quality A/B harness: teacher + hash->vm distill at candidate configs.

Implements the round-2/3 recipe (CLAUDE.md): procedural synthetic scene
(n_train=100, H=96), hash teacher 3000 iters @ grid 64, then hash->vm
students (2000 iters, stages {300, 800}) at each candidate sample budget;
prints a PSNR table.  One process end-to-end (one TPU client at a time).

Run: python tools/quality_ab.py --spr 8 6 [--smax 64] [--root /tmp/ab_scene]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PVD_DISABLE_TB", "1")  # no event-writer threads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spr", type=float, nargs="+", default=[8.0, 6.0])
    ap.add_argument("--smax", type=int, default=64)
    ap.add_argument("--root", default="/tmp/ab_scene")
    ap.add_argument("--ws", default="/tmp/ab_ws")
    ap.add_argument("--teacher_iters", type=int, default=3000)
    ap.add_argument("--distill_iters", type=int, default=2000)
    ap.add_argument("--reuse_teacher", action="store_true",
                    help="skip teacher training if its best ckpt exists")
    args = ap.parse_args()

    from pvd_tpu.utils.misc import setup_jax_cache_and_platform

    setup_jax_cache_and_platform()

    from pvd_tpu.data.synth import make_synthetic_scene

    if not os.path.exists(os.path.join(args.root, "transforms_train.json")):
        make_synthetic_scene(args.root, n_train=100, n_val=3, n_test=10,
                             H=96, W=96)
        print(f"[ab] scene at {args.root}")

    tea_ws = os.path.join(args.ws, "teacher")
    tea_ckpt = os.path.join(tea_ws, "checkpoints", "hash_best.ckpt")
    results = {}

    def find_teacher():
        # finalize_run renames the workspace with a -psnrXX suffix
        cands = ([tea_ckpt] if os.path.exists(tea_ckpt) else []) \
            + sorted(glob.glob(tea_ws + "*/checkpoints/*best*.ckpt")) \
            + sorted(glob.glob(tea_ws + "*/checkpoints/*.ckpt"))
        return cands[0] if cands else None

    if not (args.reuse_teacher and find_teacher()):
        from pvd_tpu.cli import train_teacher

        stats = train_teacher.main([
            args.root, "--model_type", "hash", "--hash_cell_levels", "9",
            "--iters", str(args.teacher_iters), "--grid_size", "64",
            "--num_rays", "4096", "--workspace", tea_ws,
            "--eval_interval", "1000",
        ])
        results["teacher"] = stats.get("psnr")
        print(f"[ab] teacher PSNR {stats.get('psnr'):.3f}")
    else:
        print(f"[ab] reusing teacher {tea_ckpt}")

    tea_ckpt = find_teacher()
    assert tea_ckpt, f"no teacher checkpoint under {tea_ws}*"
    print(f"[ab] using {tea_ckpt}")

    from pvd_tpu.cli import distill

    for spr in args.spr:
        ws = os.path.join(args.ws, f"h2v_spr{spr:g}")
        stats = distill.main([
            args.root, "--teacher_type", "hash", "--model_type", "vm",
            "--hash_cell_levels", "9",
            # grid_size must match the teacher (its occupancy state is
            # inherited verbatim; indexing a 64^3 bitfield with H=128
            # garbles the march)
            "--grid_size", "64",
            "--ckpt_teacher", tea_ckpt, "--workspace", ws,
            "--iters", str(args.distill_iters),
            "--stage_iters", "stage1=300,stage2=800",
            "--num_rays", "4096", "--max_samples", str(args.smax),
            "--samples_per_ray", str(spr), "--no_autotune_budget",
            "--eval_interval", "1000", "--ckpt", "scratch",
        ])
        results[f"spr{spr:g}"] = stats.get("psnr")
        print(f"[ab] distill spr={spr:g}: PSNR {stats.get('psnr'):.3f}")

    print("\n=== A/B summary (test PSNR) ===")
    for k, v in results.items():
        print(f"  {k:12s} {v if v is None else round(v, 3)}")


if __name__ == "__main__":
    main()
