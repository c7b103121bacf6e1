"""Quality-scale slice of the 16-pair any<->any distill matrix.

Round-3 VERDICT item 6: the full matrix runs as an 18-iter smoke test
(tests/test_distill_matrix.py); this runs 4 representative pairs at the
quality-A/B recipe scale (CLAUDE.md: synthetic scene n_train=100 H=96,
teachers 3000 iters @ grid 64, students 2000 iters, stages 300/800) and
records per-pair teacher/student PSNR deltas.  Reference scope:
main_distill_mutual.py:43-236 (any teacher_type -> any model_type).

Pairs: hash->vm, vm->hash, hash->tensors, mlp->hash.

Resume-friendly: teachers are reused if their best checkpoint exists.
One process end-to-end (one TPU client at a time).

Run: python tools/matrix_quality.py [--out MATRIX_QUALITY_r04.json]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PVD_DISABLE_TB", "1")

PAIRS = [("hash", "vm"), ("vm", "hash"), ("hash", "tensors"),
         ("mlp", "hash")]


def find_best(ws_prefix):
    cands = sorted(glob.glob(ws_prefix + "*/checkpoints/*best*.ckpt")) \
        + sorted(glob.glob(ws_prefix + "/checkpoints/*best*.ckpt"))
    return cands[0] if cands else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/matrix_scene")
    ap.add_argument("--ws", default="/tmp/matrix_ws")
    ap.add_argument("--teacher_iters", type=int, default=3000)
    ap.add_argument("--distill_iters", type=int, default=2000)
    ap.add_argument("--out", default="/tmp/matrix_quality.json")
    args = ap.parse_args()

    from pvd_tpu.utils.misc import setup_jax_cache_and_platform

    setup_jax_cache_and_platform()

    from pvd_tpu.data.synth import make_synthetic_scene

    if not os.path.exists(os.path.join(args.root, "transforms_train.json")):
        make_synthetic_scene(args.root, n_train=100, n_val=3, n_test=10,
                             H=96, W=96)
        print(f"[matrix] scene at {args.root}")

    from pvd_tpu.cli import distill, train_teacher

    results = {"pairs": {}, "teachers": {}}
    teacher_ckpt = {}
    for tea in sorted({t for t, _ in PAIRS}):
        ws = os.path.join(args.ws, f"tea_{tea}")
        ck = find_best(ws)
        if ck:
            print(f"[matrix] reusing {tea} teacher {ck}")
        else:
            t0 = time.time()
            argv = [args.root, "--model_type", tea,
                    "--iters", str(args.teacher_iters),
                    "--grid_size", "64", "--num_rays", "4096",
                    "--workspace", ws, "--eval_interval", "1000",
                    # device-resident images + scan-fused steps: amortizes
                    # the ~1.5 ms/step host+tunnel overhead (quality A/B'd
                    # within ~0.1 dB of single steps, STATUS.md)
                    "--preload", "--scan_steps", "8"]
            if tea == "hash":
                argv += ["--hash_cell_levels", "9"]
            stats = train_teacher.main(argv)
            results["teachers"][tea] = {
                "psnr": stats.get("psnr"),
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"[matrix] teacher {tea}: PSNR {stats.get('psnr')}")
            ck = find_best(ws)
        assert ck, f"no {tea} teacher checkpoint under {ws}*"
        teacher_ckpt[tea] = ck

    for tea, stu in PAIRS:
        name = f"{tea}2{stu}"
        ws = os.path.join(args.ws, name)
        t0 = time.time()
        argv = [args.root, "--teacher_type", tea, "--model_type", stu,
                "--grid_size", "64",  # must match the teacher's grid
                "--ckpt_teacher", teacher_ckpt[tea], "--workspace", ws,
                "--iters", str(args.distill_iters),
                "--stage_iters", "stage1=300,stage2=800",
                "--num_rays", "4096", "--max_samples", "64",
                "--samples_per_ray", "6", "--no_autotune_budget",
                "--eval_interval", "1000", "--ckpt", "scratch",
                "--preload", "--scan_steps", "8"]
        if tea == "hash":
            argv += ["--hash_cell_levels", "9"]
        stats = distill.main(argv)
        results["pairs"][name] = {
            "psnr": stats.get("psnr"),
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"[matrix] {name}: PSNR {stats.get('psnr')}")

    # teacher PSNRs for reused checkpoints: recover from workspace suffix
    for tea, ck in teacher_ckpt.items():
        if tea not in results["teachers"]:
            ws_dir = os.path.dirname(os.path.dirname(ck))
            psnr = None
            if "-psnr" in ws_dir:
                try:
                    psnr = float(ws_dir.rsplit("-psnr", 1)[1])
                except ValueError:
                    pass
            results["teachers"][tea] = {"psnr": psnr, "reused": True}

    for name, row in results["pairs"].items():
        tea = name.split("2")[0]
        tp = (results["teachers"].get(tea) or {}).get("psnr")
        if tp and row["psnr"]:
            row["delta_vs_teacher_db"] = round(row["psnr"] - tp, 3)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("[matrix] " + json.dumps(results))


if __name__ == "__main__":
    main()
